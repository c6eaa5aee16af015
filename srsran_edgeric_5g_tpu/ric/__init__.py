"""EdgeRIC muApp layer: RIC-side messenger + per-TTI scheduling policies."""

from .messenger import RicMessenger  # noqa: F401
from .muapp import (  # noqa: F401
    MuAppScheduler,
    fixed_weights,
    max_cqi_weights,
    max_weight_weights,
    prop_fair_weights,
    round_robin_weights,
)
from .monitor import ThroughputMonitor  # noqa: F401
from .switchboard import AlgorithmSwitch  # noqa: F401
