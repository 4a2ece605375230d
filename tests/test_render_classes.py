"""Render-class partitioning must be invisible in results.

VectorEnv partitions the env batch by live render-row counts and renders each
class through its own gather->render program (one outlier layout must not set
the whole batch's table size). These tests pin that partitioned rollouts are
bit-identical to full-batch rendering, across auto-resets, refills, and
multi-group/padded partitions.
"""

import os

import numpy as np
import pytest

import megaverse_tpu.constants as C
from megaverse_tpu.vector_env import VectorEnv


def _rollout(name, classes_on, num_envs=64, steps=8, seed=31, **params):
    if classes_on:
        os.environ.pop("MEGAVERSE_NO_CLASSES", None)
    else:
        os.environ["MEGAVERSE_NO_CLASSES"] = "1"
    try:
        env = VectorEnv(name, num_envs=num_envs, num_agents_per_env=1,
                        seed=seed, params=params or None)
        frames = [np.asarray(env.reset())]
        rng = np.random.default_rng(8)
        rews = []
        for _ in range(steps):
            md = np.stack(
                [rng.integers(0, s, size=(num_envs, 1))
                 for s in C.ACTION_SPACE_SIZES], axis=-1)
            obs, rew, done, _ = env.step(md)
            frames.append(np.asarray(obs))
            rews.append(np.asarray(rew))
        used = env._use_classes
        groups = ([(k, int(i.shape[0])) for k, i in env._cls_groups]
                  if used else [])
        return np.stack(frames), np.stack(rews), used, groups
    finally:
        os.environ.pop("MEGAVERSE_NO_CLASSES", None)


@pytest.mark.render_heavy
def test_classes_match_full_render_with_resets(monkeypatch):
    """Forced-on classes over short episodes (refill + consume-buffer path)."""
    monkeypatch.setattr(VectorEnv, "_CLASS_MIN_ROWS", 0)
    f_full, r_full, used, _ = _rollout(
        "Sokoban", False, steps=20, **{C.P_EPISODE_LENGTH_SEC: 1.0})
    assert not used
    f_cls, r_cls, used, _ = _rollout(
        "Sokoban", True, steps=20, **{C.P_EPISODE_LENGTH_SEC: 1.0})
    assert used
    np.testing.assert_array_equal(f_full, f_cls)
    np.testing.assert_array_equal(r_full, r_cls)


@pytest.mark.render_heavy
def test_classes_multi_group_collect():
    """Collect's heavy-tailed layouts split into several padded groups.
    One step suffices: the reset frame + one stepped frame cover the
    gather->render->inverse-permutation path for every group (CPU renders
    of 64 heavy Collect layouts are the suite's slowest item — was 485 s
    at steps=3)."""
    f_full, _, used, _ = _rollout("Collect", False, steps=1, seed=13)
    assert not used
    f_cls, _, used, groups = _rollout("Collect", True, steps=1, seed=13)
    assert used and len(groups) >= 2
    np.testing.assert_array_equal(f_full, f_cls)


def test_backend_auto_pick(monkeypatch):
    """Heavy scenes pick the cluster-culled Pallas kernel on TPU, tiny scenes
    the fused unrolled XLA renderer; MEGAVERSE_RENDERER always wins."""
    import jax as _jax
    import megaverse_tpu.vector_env as VE

    built = VectorEnv("Empty", num_envs=2, num_agents_per_env=1, render=False)
    assert built._backend == "xla"  # CPU backend in tests

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert VectorEnv("Empty", num_envs=2, render=False,
                     num_agents_per_env=1)._backend == "unroll"
    assert VectorEnv("Collect", num_envs=2, render=False,
                     num_agents_per_env=1)._backend == "pallas"
    # mid-size scenes (~113 worst-case rows) also take the culled kernel
    assert VectorEnv("Sokoban", num_envs=2, render=False,
                     num_agents_per_env=1)._backend == "pallas"
    monkeypatch.setenv("MEGAVERSE_RENDERER", "xla")
    assert VectorEnv("Collect", num_envs=2, render=False,
                     num_agents_per_env=1)._backend == "xla"
