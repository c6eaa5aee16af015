"""MAC layer: per-slot scheduler with EdgeRIC real-time policy hooks."""

from .scheduler import (  # noqa: F401
    CellScheduler,
    DlGrant,
    SchedulerConfig,
    SchedUe,
    mcs_from_cqi,
    prbs_for_bytes,
)
