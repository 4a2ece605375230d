"""Learner + multi-chip training tests (virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from megaverse_tpu.env import render_batch
from megaverse_tpu.parallel import ParallelLearner, make_mesh
from megaverse_tpu.rl.learner import Learner, TrainConfig
from megaverse_tpu.scenarios import make_scenario
from megaverse_tpu.types import state_from_scene


def _setup(num_envs, num_agents=1, scenario_name="Empty"):
    scenario = make_scenario(scenario_name, num_agents=num_agents)
    gens = [np.random.default_rng(i) for i in range(num_envs)]
    stack = lambda *xs: jnp.stack([jnp.asarray(x) for x in xs])
    scenes = jax.tree.map(stack, *[scenario.generate(g) for g in gens])
    nxt = jax.tree.map(stack, *[scenario.generate(g) for g in gens])
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.vmap(lambda sc, k: state_from_scene(sc, num_agents, k))(scenes, keys)
    obs = render_batch(scenario, state, fmt="packed")
    return scenario, state, obs, nxt


def test_single_device_train_step():
    scenario, state, obs, nxt = _setup(4)
    learner = Learner(scenario, 4, TrainConfig(rollout=3, use_rnn=True))
    ls = learner.init(jax.random.PRNGKey(0), state, obs)
    shaping = jnp.asarray(np.tile(scenario.shaping_array()[None], (4, 1, 1)))
    ls2, metrics = jax.jit(
        lambda l: learner.train_step(l, nxt, shaping))(ls)
    assert np.isfinite(float(metrics["loss"]))
    # params changed
    p0 = jax.tree.leaves(ls.params)[0]
    p1 = jax.tree.leaves(ls2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # env advanced by rollout steps
    assert int(np.asarray(ls2.env_state.num_frames).max()) == 3


def test_parallel_learner_matches_devices():
    n = jax.device_count()
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    scenario, state, obs, nxt = _setup(8)
    learner = Learner(scenario, 8, TrainConfig(rollout=2, use_rnn=False))
    mesh = make_mesh(8)
    pl = ParallelLearner(learner, mesh)
    ls = pl.init(jax.random.PRNGKey(1), state, obs)
    shaping = jnp.asarray(np.tile(scenario.shaping_array()[None], (8, 1, 1)))
    ls, metrics = pl.train_step(ls, nxt, shaping)
    assert np.isfinite(float(metrics["loss"]))
    ls, metrics2 = pl.train_step(ls, nxt, shaping)
    assert np.isfinite(float(metrics2["loss"]))


def test_entropy_starts_uniform():
    scenario, state, obs, nxt = _setup(2)
    learner = Learner(scenario, 2, TrainConfig(rollout=2, use_rnn=True))
    ls = learner.init(jax.random.PRNGKey(0), state, obs)
    shaping = jnp.asarray(np.tile(scenario.shaping_array()[None], (2, 1, 1)))
    _, metrics = learner.train_step(ls, nxt, shaping)
    # uniform over Tuple(3,3,3,2,2,3): ln(3^4 * 2^2) = 5.783
    assert abs(float(metrics["entropy"]) - 5.783) < 0.2


def test_stacked_rnn_carry_and_reward_clip():
    """rnn_num_layers stacks GRU cells into one packed carry; rewards are
    clamped to +-reward_clip before the update (SF --reward_clip=30)."""
    scenario, state, obs, nxt = _setup(2)
    cfg = TrainConfig(rollout=2, use_rnn=True, rnn_num_layers=2,
                      hidden_size=64, reward_clip=30.0)
    learner = Learner(scenario, 2, cfg)
    assert learner.model.carry_size == 128
    ls = learner.init(jax.random.PRNGKey(0), state, obs)
    assert ls.carry.shape[-1] == 128
    ls2, batch = learner.collect_rollout(
        ls, nxt, jnp.asarray(np.tile(scenario.shaping_array()[None], (2, 1, 1))))
    # both layers' carries update
    c = np.asarray(ls2.carry)
    assert np.abs(c[..., :64]).max() > 0 and np.abs(c[..., 64:]).max() > 0
    assert float(np.abs(np.asarray(batch.reward)).max()) <= 30.0


def test_host_rollout_matches_scan():
    """train_step_host (tunnel-mode host-driven rollout; one fused dispatch
    per step) is bit-compatible with the lax.scan rollout: same per-step
    ops in the same order, so params/metrics/env state come out equal."""
    scenario, state, obs, nxt = _setup(2)
    cfg = TrainConfig(rollout=3, use_rnn=True, hidden_size=64)
    learner = Learner(scenario, 2, cfg)
    ls0 = learner.init(jax.random.PRNGKey(0), state, obs)
    shaping = jnp.asarray(np.tile(scenario.shaping_array()[None], (2, 1, 1)))

    ls_a, m_a = jax.jit(learner.train_step)(ls0, nxt, shaping)
    ls_b, m_b = learner.train_step_host(ls0, nxt, shaping)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(m_a["reward_mean"]),
                               float(m_b["reward_mean"]), rtol=1e-6, atol=0)
    for pa, pb in zip(jax.tree.leaves(ls_a.params), jax.tree.leaves(ls_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ls_a.env_state.agents.pos),
                                  np.asarray(ls_b.env_state.agents.pos))
