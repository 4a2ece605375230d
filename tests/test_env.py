"""Environment integration tests, mirroring the reference's Python suite
(megaverse/tests/test_env.py): lifecycle, fixed-seed determinism, auto-reset,
reward-shaping API."""

import jax.numpy as jnp
import numpy as np
import pytest

import megaverse_tpu.constants as C
from megaverse_tpu.vector_env import VectorEnv


def make_env(**kw):
    kw.setdefault("scenario_name", "Empty")
    kw.setdefault("num_envs", 2)
    kw.setdefault("num_agents_per_env", 1)
    kw.setdefault("seed", 42)
    return VectorEnv(**kw)


def random_actions(rng, num_envs, num_agents):
    md = np.stack(
        [rng.integers(0, s, size=(num_envs, num_agents)) for s in C.ACTION_SPACE_SIZES],
        axis=-1,
    )
    return md


def test_lifecycle():
    env = make_env()
    obs = env.reset()
    assert obs.shape == (2, 1, 72, 128, 3)
    assert obs.dtype == jnp.uint8
    rng = np.random.default_rng(0)
    for _ in range(5):
        obs, rew, done, tobj = env.step(random_actions(rng, 2, 1))
    assert obs.shape == (2, 1, 72, 128, 3)
    assert rew.shape == (2, 1)
    assert done.shape == (2,)


def test_seeds_determinism():
    """Fixed seed => identical observations across instances (ref test_seeds,
    megaverse/tests/test_env.py:42-55)."""
    e1 = make_env(seed=123)
    e2 = make_env(seed=123)
    o1, o2 = e1.reset(), e2.reset()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    for _ in range(10):
        o1, *_ = e1.step(random_actions(rng1, 2, 1))
        o2, *_ = e2.step(random_actions(rng2, 2, 1))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_different_seeds_differ():
    e1 = make_env(seed=1, num_agents_per_env=2)
    e2 = make_env(seed=2, num_agents_per_env=2)
    o1, o2 = e1.reset(), e2.reset()
    # random spawn yaw differs -> observations differ
    assert not np.array_equal(np.asarray(o1), np.asarray(o2))


def test_auto_reset_short_episode():
    """Short episodes auto-reset inside the step (ref test_env.py:57-88)."""
    env = make_env(params={C.P_EPISODE_LENGTH_SEC: 1.0}, num_envs=3)
    env.reset()
    n_steps = int(1.0 / C.DEFAULT_DT)
    dones_seen = 0
    rng = np.random.default_rng(1)
    for i in range(2 * n_steps + 2):
        obs, rew, done, tobj = env.step(random_actions(rng, 3, 1))
        dones_seen += int(np.asarray(done).sum())
    assert dones_seen >= 3  # every env finished at least one episode
    # after reset the env keeps running
    st = env.state
    assert not bool(np.asarray(st.done).any())
    assert int(np.asarray(st.num_frames).max()) <= n_steps + 1


def test_reward_shaping_api():
    env = make_env()
    env.reset()
    rs = env.get_reward_shaping(0, 0)
    assert C.P_TEAM_SPIRIT in rs
    rs[C.P_TEAM_SPIRIT] = 0.5
    env.set_reward_shaping(0, 0, rs)
    assert env.get_reward_shaping(0, 0)[C.P_TEAM_SPIRIT] == 0.5
    assert env.get_reward_shaping(1, 0)[C.P_TEAM_SPIRIT] == 0.0


def test_action_space_sizes():
    env = make_env()
    assert env.action_space_sizes == [3, 3, 3, 2, 2, 3]


def test_multi_agent_obs_shapes():
    env = make_env(num_agents_per_env=2, num_envs=2)
    obs = env.reset()
    assert obs.shape == (2, 2, 72, 128, 3)


def test_render_bucket_matches_full_table():
    """Bucketed render-table slicing (env.render_batch bucket=...) must be
    bit-identical to rendering the full capacity table."""
    import os

    def rollout():
        env = make_env(scenario_name="Collect", num_envs=2, seed=77)
        frames = [np.asarray(env.reset())]
        rng = np.random.default_rng(1)
        for _ in range(6):
            obs, *_ = env.step(random_actions(rng, 2, 1))
            frames.append(np.asarray(obs))
        return np.stack(frames), env._bucket

    os.environ["MEGAVERSE_NO_BUCKET"] = "1"
    try:
        full, b_full = rollout()
    finally:
        del os.environ["MEGAVERSE_NO_BUCKET"]
    bucketed, b = rollout()
    assert b_full is None and b is not None
    assert np.array_equal(full, bucketed)


def test_sharded_batch_matches_single_device():
    """Env batch sharded over the 8-device mesh must produce exactly the
    results of the unsharded batch (vmapped step is SPMD over B)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    def rollout(device):
        env = make_env(num_envs=8, seed=21, device=device)
        frames = [np.asarray(env.reset())]
        rng = np.random.default_rng(3)
        rews = []
        for _ in range(5):
            obs, rew, done, _ = env.step(random_actions(rng, 8, 1))
            frames.append(np.asarray(obs))
            rews.append(np.asarray(rew))
        return np.stack(frames), np.stack(rews)

    f1, r1 = rollout(None)
    f8, r8 = rollout(sharding)
    assert np.array_equal(f1, f8)
    assert np.array_equal(r1, r8)


def test_prefetch_pool_is_deterministic(monkeypatch):
    """Multi-worker layout prefetch must be bit-identical to synchronous
    generation: per-env streams are consumed in order with at most one task in
    flight per env, so scheduling cannot reorder them. Short episodes force
    several refills through the pool."""
    def run(no_prefetch):
        if no_prefetch:
            monkeypatch.setenv("MEGAVERSE_NO_PREFETCH", "1")
        else:
            monkeypatch.delenv("MEGAVERSE_NO_PREFETCH", raising=False)
            monkeypatch.setenv("MEGAVERSE_GEN_THREADS", "4")
        # Sokoban honors episodeLengthSec directly (Collect/Hex/Tower extend
        # it per reward object), so 1.0 s -> a reset every 15 steps.
        env = VectorEnv("Sokoban", num_envs=4, num_agents_per_env=1, seed=21,
                        params={C.P_EPISODE_LENGTH_SEC: 1.0})
        frames = [np.asarray(env.reset())]
        act = np.full((4, 1), C.ACTION_FORWARD, np.int32)
        resets = 0
        for _ in range(40):
            obs, _, done, _ = env.step(act)
            frames.append(np.asarray(obs))
            resets += int(np.asarray(done).sum())
        env.close()
        assert resets >= 8, resets  # refills actually flowed through the pool
        return np.stack(frames)

    np.testing.assert_array_equal(run(True), run(False))
