"""muApp2 RL layer: digital-twin env dynamics + PPO training smoke."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from srsran_edgeric_5g_tpu.ric import rl


def test_env_contract_and_delays():
    cfg = rl.EnvConfig(num_ues=2, horizon=8, delay_state=2, delay_action=1,
                       seed=3)
    env = rl.EdgeRicSimEnv(cfg)
    s = env.reset()
    assert s.shape == (6,)
    # observation delay: backlog grows immediately but the obs lags 2 TTIs
    s1, r, done, info = env.step(np.array([0.5, 0.5]))
    assert s1[0] == 0.0 and s1[3] == 0.0        # still the t=0 snapshot
    s2, *_ = env.step(np.array([0.5, 0.5]))
    s3, *_ = env.step(np.array([0.5, 0.5]))
    assert s3[0] > 0 or s3[3] > 0                # lagged arrivals now visible
    for _ in range(5):
        s, r, done, info = env.step(np.array([0.5, 0.5]))
    assert done                                   # horizon honored


def test_env_service_follows_mac_law():
    """A weight of 1.0 on one UE drains it at TBS(nof_prb, MCS(CQI))/8."""
    cfg = rl.EnvConfig(num_ues=2, horizon=4, arrival_bytes=(50_000, 50_000),
                       cqi_bands=((9, 9), (9, 9)), delay_state=0,
                       delay_action=0, seed=0)
    env = rl.EdgeRicSimEnv(cfg)
    env.reset()
    _, r_all, _, info = env.step(np.array([1.0, 0.0]))
    cap = rl._bytes_per_tti(52, 9)
    assert info["served_bytes"] == pytest.approx(min(cap, 50_000 * 1.2),
                                                 rel=0.3)
    # splitting halves each UE's capacity (sub-linear TBS ignored @rel tol)
    env.reset()
    _, _, _, info2 = env.step(np.array([0.5, 0.5]))
    assert info2["served_bytes"] <= 2 * rl._bytes_per_tti(26, 9)


def test_weights_favoring_strong_ue_earn_more():
    """Sanity before RL: with one high-CQI saturated UE, skewed weights beat
    the uniform split — the gradient PPO must find."""
    cfg = rl.EnvConfig(num_ues=2, horizon=32,
                       arrival_bytes=(40_000, 2_000),
                       cqi_bands=((13, 15), (3, 5)), seed=1)
    env = rl.EdgeRicSimEnv(cfg)
    uniform = rl.evaluate(env, lambda s: np.array([0.5, 0.5]), episodes=5)
    skewed = rl.evaluate(env, lambda s: np.array([0.9, 0.1]), episodes=5)
    assert skewed > uniform * 1.1


def test_ppo_learns_to_beat_uniform():
    """PPO on the twin: the trained policy outperforms the uniform split on
    the asymmetric scenario (the reference's RL-beats-baseline claim,
    edgeric-v2 README ~11.7 vs ~8 Mbit/s)."""
    cfg = rl.EnvConfig(num_ues=2, horizon=32,
                       arrival_bytes=(40_000, 2_000),
                       cqi_bands=((13, 15), (3, 5)), seed=2)
    env = rl.EdgeRicSimEnv(cfg)
    policy, history = rl.ppo_train(env, iterations=12, batch_steps=512,
                                   seed=0)

    def policy_fn(obs):
        scale = np.array([1e-5, 1 / 15.0, 1e-6] * 2, dtype=np.float32)
        with torch.no_grad():
            a = policy.select_action(
                torch.as_tensor(obs * scale).unsqueeze(0),
                deterministic=True)
        return a[0].numpy()

    eval_env = rl.EdgeRicSimEnv(rl.EnvConfig(num_ues=2, horizon=32,
                                             arrival_bytes=(40_000, 2_000),
                                             cqi_bands=((13, 15), (3, 5)),
                                             seed=77))
    uniform = rl.evaluate(eval_env, lambda s: np.array([0.5, 0.5]),
                          episodes=10)
    trained = rl.evaluate(eval_env, policy_fn, episodes=10)
    assert trained > uniform * 1.02, (trained, uniform, history)


def test_trained_policy_plugs_into_muapp(tmp_path):
    """A saved checkpoint loads through muapp.TorchWeightPolicy — the
    muApp1 torch.load(model_demo.pt) consumption path."""
    from srsran_edgeric_5g_tpu.ric import muapp

    policy = rl.build_policy(6, 2)
    path = tmp_path / "model_demo.pt"
    torch.save(policy, path)
    twp = muapp.TorchWeightPolicy(str(path))
    ue_data = {0x4601: {"cqi": 12, "ul_buffer": 1000},
               0x4602: {"cqi": 5, "ul_buffer": 2000}}
    w = twp(ue_data)
    assert set(w) == {0x4601, 0x4602}
    assert sum(w.values()) == pytest.approx(1.0)


def test_ppo_checkpoint_normalization_survives_deployment(tmp_path):
    """A ppo_train checkpoint deployed through TorchWeightPolicy sees the
    SAME normalized features as training (the obs_scale rides in the
    checkpoint) — raw features would saturate the tanh layers and freeze
    the weights regardless of CQI/backlog."""
    from srsran_edgeric_5g_tpu.ric import muapp

    cfg = rl.EnvConfig(num_ues=2, horizon=16, seed=4)
    env = rl.EdgeRicSimEnv(cfg)
    policy, _ = rl.ppo_train(env, iterations=1, batch_steps=64, seed=0)
    path = tmp_path / "model_demo.pt"
    torch.save(policy, path)
    twp = muapp.TorchWeightPolicy(str(path))
    assert getattr(twp.model, "obs_scale", None) is not None

    # Deterministic head for the response check.
    twp.model.select_action = (
        lambda x, deterministic=False:
        rl.Policy.select_action(twp.model, x, deterministic=True))
    base = {0x4601: {"cqi": 8, "ul_buffer": 50_000},
            0x4602: {"cqi": 8, "ul_buffer": 50_000}}
    w0 = twp(base)
    moved = {0x4601: {"cqi": 15, "ul_buffer": 290_000},
             0x4602: {"cqi": 1, "ul_buffer": 100}}
    w1 = twp(moved)
    # Normalized inputs keep the network in its responsive region: a large
    # feature move must move the output (raw inputs give |Δ| ~ 0 exactly).
    delta = abs(w1[0x4601] - w0[0x4601]) + abs(w1[0x4602] - w0[0x4602])
    assert delta > 1e-4, (w0, w1)


def test_env_defaults_broadcast_to_any_ue_count():
    """EnvConfig 2-UE default tuples broadcast to num_ues != 2."""
    env = rl.EdgeRicSimEnv(rl.EnvConfig(num_ues=4, horizon=4, seed=0))
    s = env.reset()
    assert s.shape == (12,)
    s, r, done, info = env.step(np.full(4, 0.25))
    assert s.shape == (12,) and np.isfinite(r)
