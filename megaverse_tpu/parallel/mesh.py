"""Multi-chip scaling via jax.sharding: data parallelism over the env batch.

The reference scales out with OS threads (VectorEnv, vector_env.cpp:6-127),
Sample Factory worker processes on one machine, and slurm across machines —
communication via shared memory / filesystem (SURVEY 2.3). The TPU-native
equivalent is a device mesh: the environment batch (and its per-env scene
buffers) shards over the `data` axis, parameters replicate, and the only
cross-chip traffic is the gradient all-reduce riding ICI (`jax.lax.pmean`
inside shard_map). Observations are produced and consumed on the same chip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from megaverse_tpu.rl.learner import Learner, LearnerState
from megaverse_tpu.types import SceneData

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


class ParallelLearner:
    """Wraps a Learner's train step in shard_map over a device mesh.

    env state / obs / rollout shard over DATA_AXIS (leading env-batch dim);
    params and optimizer state replicate; gradients pmean over the axis.
    `num_envs` of the wrapped Learner is the GLOBAL batch and must divide by
    mesh size.
    """

    def __init__(self, learner: Learner, mesh: Mesh):
        self.learner = learner
        self.mesh = mesh
        n = mesh.devices.size
        if learner.num_envs % n != 0:
            raise ValueError(f"num_envs {learner.num_envs} not divisible by mesh size {n}")
        self.envs_per_device = learner.num_envs // n

        repl = P()
        shard = P(DATA_AXIS)

        def spec_like(tree, spec):
            return jax.tree.map(lambda _: spec, tree,
                                is_leaf=lambda x: x is None)

        def step_fn(params, opt_state, env_state, obs, carry, rng, step,
                    next_scenes, shaping):
            ls = LearnerState(params, opt_state, env_state, obs, carry,
                              rng[0], step)
            ls, metrics = learner.train_step(ls, next_scenes, shaping,
                                             axis_name=DATA_AXIS)
            return (ls.params, ls.opt_state, ls.env_state, ls.obs, ls.carry,
                    ls.rng[None], ls.step, metrics)

        # Partition specs: pytree-prefix form (a single spec per state leaf
        # group). rng carries a leading [n_devices] axis so each shard owns an
        # independent PRNG stream.
        kwargs = dict(
            mesh=mesh,
            in_specs=(repl, repl, shard, shard, shard, shard, repl, shard, shard),
            out_specs=(repl, repl, shard, shard, shard, shard, repl, repl),
        )
        try:
            self._sharded_step = shard_map(step_fn, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover - pre-0.6 jax
            self._sharded_step = shard_map(step_fn, check_rep=False, **kwargs)
        self._jitted = jax.jit(self._sharded_step)

    def init(self, rng: jax.Array, env_state, obs) -> LearnerState:
        """Build a global LearnerState; rng becomes [n_devices] keys."""
        ls = self.learner.init(rng, env_state, obs)
        n = self.mesh.devices.size
        return ls._replace(rng=jax.random.split(jax.random.fold_in(rng, 7), n))

    def _use_host_rollout(self) -> bool:
        """Single-chip tunneled dev TPUs drive the rollout from the host
        (Learner.train_step_host): a Pallas render inside lax.scan costs a
        host round-trip per iteration there. Real hardware and multi-chip
        meshes keep the single sharded program.
        MEGAVERSE_TRAIN_ROLLOUT=scan|host overrides."""
        import os

        forced = os.environ.get("MEGAVERSE_TRAIN_ROLLOUT")
        if forced == "scan":
            return False
        if forced == "host":
            return True
        from megaverse_tpu.utils.platform import is_tunneled_tpu

        return self.mesh.devices.size == 1 and is_tunneled_tpu()

    def train_step(self, ls: LearnerState, next_scenes: SceneData, shaping):
        if self._use_host_rollout():
            # unwrap the [n_devices]-leading rng for the unsharded path
            inner = ls._replace(rng=ls.rng[0])
            inner, metrics = self.learner.train_step_host(
                inner, next_scenes, shaping)
            return inner._replace(rng=inner.rng[None]), metrics
        out = self._jitted(ls.params, ls.opt_state, ls.env_state, ls.obs,
                           ls.carry, ls.rng, ls.step, next_scenes, shaping)
        (params, opt_state, env_state, obs, carry, rng, step, metrics) = out
        return LearnerState(params, opt_state, env_state, obs, carry, rng, step), metrics
