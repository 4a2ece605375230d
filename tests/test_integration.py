"""Integration tests mirroring the reference's remaining test tiers.

- RSS memleak watch over many steps (ref megaverse/tests/test_env.py:142-161)
- multitask envs in subprocesses (ref test_env.py:163-185)
- RL-level smoke: Sokoban through the gym API with random actions
  (ref megaverse_rl/tests/test_megaverse_env.py:9-25)
- step_many scan mode type-stability (regression: packed obs carry)
"""

import multiprocessing as mp
import os

import numpy as np
import pytest


def _rss_mb() -> float:
    """Resident set size in MB from /proc (ref os_utils.hpp:11-30)."""
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


@pytest.mark.render_heavy
def test_memleak_watch():
    from megaverse_tpu.vector_env import VectorEnv

    env = VectorEnv("Empty", num_envs=4, num_agents_per_env=1, seed=7,
                    params={"episodeLengthSec": 2.0})
    env.reset()
    act = np.zeros((4, 1), np.int32)
    for _ in range(20):  # warmup: compile + first episode resets
        env.step(act)
    before = _rss_mb()
    for _ in range(300):
        env.step(act)
    growth = _rss_mb() - before
    assert growth < 200.0, f"RSS grew {growth:.1f} MB over 300 steps"


def _subprocess_task(task_idx: int, q) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from megaverse_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from megaverse_tpu.gym_env import make_env_multitask

    env = make_env_multitask("multitask_megaverse8", task_idx,
                             num_envs=1, num_agents_per_env=1)
    obs = env.reset()
    for _ in range(3):
        obs, rew, dones, infos = env.step([np.zeros(6, np.int64)])
    q.put((task_idx, env.scenario_name, obs[0].shape))
    env.close()


@pytest.mark.slow
def test_multitask_two_subprocesses():
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_subprocess_task, args=(i, q)) for i in (0, 1)]
    for p in procs:
        p.start()
    results = sorted(q.get(timeout=600) for _ in procs)
    for p in procs:
        p.join(timeout=60)
    assert results[0] == (0, "towerbuilding", (3, 72, 128))
    assert results[1] == (1, "obstacleseasy", (3, 72, 128))


@pytest.mark.slow
def test_rl_smoke_sokoban_random_steps():
    """1000 random steps through the gym API without error (ref
    megaverse_rl/tests/test_megaverse_env.py:9-25)."""
    from megaverse_tpu.gym_env import MegaverseEnv

    env = MegaverseEnv("Sokoban", num_envs=2, num_agents_per_env=1)
    env.seed(0)
    env.reset()
    rng = np.random.default_rng(0)
    for _ in range(1000):
        acts = [rng.integers(0, [3, 3, 3, 2, 2, 3]) for _ in range(2)]
        obs, rewards, dones, infos = env.step(acts)
    assert len(obs) == 2 and len(rewards) == 2
    assert all(np.isfinite(r) for r in rewards)
    env.close()


def test_enjoy_playback_with_checkpoint(tmp_path):
    """enjoy loads a train-format checkpoint and rolls episodes."""
    import pickle

    import jax
    import jax.numpy as jnp

    from megaverse_tpu.models.actor_critic import ActorCritic
    from megaverse_tpu.rl import enjoy

    model = ActorCritic(hidden_size=512, use_rnn=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 72, 128, 3), jnp.uint8),
                        jnp.zeros((1, model.carry_size)))
    ckpt = tmp_path / "checkpoint.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, params),
                     "steps": 123}, f)
    rc = enjoy.main(["--env", "Empty", "--episodes", "1", "--max_steps", "6",
                     "--checkpoint", str(ckpt)])
    assert rc == 0


@pytest.mark.render_heavy
def test_step_many_scan_packed_and_rgb():
    """lax.scan chunk mode must be carry-type-stable for both obs formats."""
    os.environ["MEGAVERSE_SCAN_STEPS"] = "1"
    try:
        from megaverse_tpu.vector_env import VectorEnv

        for fmt in ("packed", "rgb"):
            env = VectorEnv("Empty", num_envs=2, num_agents_per_env=1,
                            seed=5, obs_format=fmt)
            env.reset()
            pool = np.zeros((2, 2, 1), np.int32)
            obs, dones, csums = env.step_many(pool, 4)
            assert np.asarray(dones).shape == (4, 2)
            if fmt == "packed":
                assert obs.shape == (2, 1, 72, 128)
            else:
                assert obs.shape == (2, 1, 72, 128, 3)
    finally:
        os.environ.pop("MEGAVERSE_SCAN_STEPS", None)


@pytest.mark.render_heavy
def test_bench_fence_checksum_is_data_dependent():
    """The bench timing fence fetches the step_many checksum VALUE
    (bench.py): that is a sound fence only if the scalar is data-dependent
    on the chunk's final observations (whose state chain covers every step),
    so its concrete value cannot exist before the device work finished.
    Verify the dependency: the checksum equals the final frame's int32 sum,
    and stepping further changes it with the frame."""
    from megaverse_tpu.vector_env import VectorEnv

    env = VectorEnv("Empty", num_envs=2, num_agents_per_env=1, seed=3)
    env.reset()
    pool = np.full((2, 2, 1), 0, np.int32)
    pool[0] = 2  # forward bit pattern varies frames between steps
    obs, dones, csums = env.step_many(pool, 3)
    assert int(csums[-1]) == int(np.sum(np.asarray(obs), dtype=np.int32))
    obs2, _, csums2 = env.step_many(pool, 3)
    assert int(csums2[-1]) == int(np.sum(np.asarray(obs2), dtype=np.int32))
    env.close()


def test_viewer_state_smoke():
    """Interactive viewer core (scripts/viewer_app.py): keyboard bitmask,
    stepping, agent switching, overview fly-cam and hires frames — everything
    behind the HTTP layer — runs headless."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "viewer_app", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "viewer_app.py"))
    va = importlib.util.module_from_spec(spec)
    sys.modules["viewer_app"] = va
    spec.loader.exec_module(va)

    os.environ["MEGAVERSE_VIEWER_CPU"] = "1"
    st = va.ViewerState("Empty", num_agents=2, seed=3, hires=1)
    out = st.step(["KeyW"])                  # forward
    assert out["frame"] and out["frame_no"] == 1 and out["agent"] == 0
    out = st.step(["Tab"])                   # switch agent
    assert out["agent"] == 1
    out = st.step(["KeyO", "KeyI"])          # overview fly-cam
    assert out["overview"] is True and out["frame"]
    import base64
    png = base64.b64decode(out["frame"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
