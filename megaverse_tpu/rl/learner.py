"""On-device APPO-style learner.

The reference delegates training to Sample Factory APPO across processes
(megaverse_rl/train_megaverse.py:32-42: actor workers render on GPUs, a learner
process optimizes). On TPU the whole loop — rollout (env step + policy
inference) and the PPO update — is one jitted program: observations never leave
device HBM (eliminating the reference's GPU->CPU readback,
v4r_env_renderer.cpp:357-362), and scale-out is sharding the env batch over the
device mesh (see megaverse_tpu.parallel).

Hyperparameter defaults follow the reference README training command
(README.md:134: rollout 32, recurrence 32, batch 4096) and
megaverse_params.py:4-21 (symmetric_kl exploration loss, coeff 0.001).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from megaverse_tpu import constants as C
from megaverse_tpu.env import env_step, render_batch
from megaverse_tpu.models.actor_critic import (
    ActorCritic,
    action_log_prob_entropy,
    sample_actions,
    symmetric_kl_from_uniform,
)
from megaverse_tpu.scenarios.base import Scenario
from megaverse_tpu.types import EnvState, SceneData, multidiscrete_to_bitmask


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    rollout: int = 32
    lr: float = 1e-4
    gamma: float = 0.997
    gae_lambda: float = 0.95
    clip_ratio: float = 0.1
    value_coeff: float = 0.5
    exploration_coeff: float = 0.001  # symmetric_kl, megaverse_params.py:17
    max_grad_norm: float = 4.0  # 0 disables clipping (reference runs pass 0)
    reward_clip: float = 30.0   # clamp |reward| before the update (SF --reward_clip)
    num_epochs: int = 1         # PPO epochs over each rollout (SF --ppo_epochs)
    num_minibatches: int = 1    # env-axis minibatches per epoch (SF num_batches_per_epoch)
    # Schedules (both need total_env_steps > 0): lr decays linearly
    # lr -> lr_final over the run; the exploration coefficient anneals
    # exploration_coeff -> exploration_final with training progress
    # (prevents the premature entropy collapse seen in the round-2 demo).
    lr_final: float = -1.0      # < 0: constant lr
    exploration_final: float = -1.0  # < 0: constant coefficient
    total_env_steps: float = 0.0
    hidden_size: int = 512
    use_rnn: bool = True
    rnn_num_layers: int = 2     # reference runs: --rnn_num_layers=2


class RolloutBatch(NamedTuple):
    obs: jax.Array        # packed i32 [T, B, A, H, W]
    actions: jax.Array    # i32 [T, B, A, 6]
    logp: jax.Array       # f32 [T, B, A]
    value: jax.Array      # f32 [T, B, A]
    reward: jax.Array     # f32 [T, B, A]
    done: jax.Array       # bool [T, B]
    init_carry: jax.Array  # f32 [B, A, hidden]


class LearnerState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: EnvState   # batched [B, ...]
    obs: jax.Array        # packed i32 [B, A, H, W] current observations
    carry: jax.Array      # f32 [B, A, hidden] RNN state
    rng: jax.Array
    step: jax.Array       # i32 env steps so far


class Learner:
    """Builds jitted init / train-step functions for one scenario."""

    def __init__(self, scenario: Scenario, num_envs: int, cfg: TrainConfig = TrainConfig(),
                 render_bucket: Optional[Tuple[int, int]] = None,
                 render_backend: Optional[str] = None):
        self.scenario = scenario
        self.num_envs = num_envs
        self.cfg = cfg
        # (max live boxes, max live props) across the env batch — statically
        # slices the render tables (see env.render_batch). Supplied by the
        # caller from generated-layout counts; None renders full capacity.
        self.render_bucket = render_bucket
        # Scene-size-aware renderer (env.pick_render_backend): tiny scenes
        # fuse the unrolled XLA renderer into the rollout scan.
        from megaverse_tpu.env import pick_render_backend

        self.render_backend = render_backend or pick_render_backend(scenario)
        self.model = ActorCritic(hidden_size=cfg.hidden_size, use_rnn=cfg.use_rnn,
                                 rnn_num_layers=cfg.rnn_num_layers)
        clip = ([optax.clip_by_global_norm(cfg.max_grad_norm)]
                if cfg.max_grad_norm > 0 else [])
        lr = cfg.lr
        if cfg.lr_final >= 0.0 and cfg.total_env_steps > 0:
            # linear decay over the planned number of optimizer updates
            per_update = cfg.rollout * num_envs
            n_updates = max(1, int(cfg.total_env_steps / per_update)) \
                * max(1, cfg.num_epochs) * max(1, cfg.num_minibatches)
            lr = optax.linear_schedule(cfg.lr, cfg.lr_final, n_updates)
        self.tx = optax.chain(*clip, optax.adam(lr))

    # ------------------------------------------------------------------ init
    def init(self, rng: jax.Array, env_state: EnvState, obs: jax.Array) -> LearnerState:
        scen = self.scenario.cfg
        dummy = jnp.zeros((1, scen.obs_height, scen.obs_width, 3), jnp.uint8)
        params = self.model.init(rng, dummy)
        opt_state = self.tx.init(params)
        b, a = self.num_envs, scen.num_agents
        carry = self.model.initial_carry((b, a))
        return LearnerState(params, opt_state, env_state, obs, carry,
                            jax.random.fold_in(rng, 1), jnp.asarray(0, jnp.int32))

    # --------------------------------------------------------------- rollout
    def _policy(self, params, obs, carry):
        return self.model.apply(params, obs, carry)

    def collect_rollout(
        self, ls: LearnerState, next_scenes: SceneData, shaping: jax.Array
    ) -> Tuple[LearnerState, RolloutBatch]:
        scen = self.scenario
        from megaverse_tpu.env import apply_deferred_resets, should_defer_reset

        defer = should_defer_reset(scen)
        vstep_mapped = jax.vmap(
            functools.partial(env_step, scen, render_obs=False,
                              defer_reset=defer), in_axes=(0, 0, 0, 0)
        )

        if defer:
            def vstep(env_state, scenes, mask, shaping):
                res = vstep_mapped(env_state, scenes, mask, shaping)
                return res._replace(state=apply_deferred_resets(
                    res.state, scenes, res.done,
                    scen_fields=scen.deferred_scen_fields))
        else:
            vstep = vstep_mapped

        init_carry = ls.carry

        def one_step(carry, _):
            env_state, obs, rnn, rng = carry
            rng, k = jax.random.split(rng)
            logits, value, rnn2 = self._policy(ls.params, obs, rnn)
            actions, logp = sample_actions(logits, k)
            mask = multidiscrete_to_bitmask(actions)
            res = vstep(env_state, next_scenes, mask, shaping)
            new_obs = render_batch(scen, res.state, fmt="packed",
                                   bucket=self.render_bucket,
                                   backend=self.render_backend)
            # reset RNN state on episode boundary
            rnn2 = jnp.where(res.done[:, None, None], 0.0, rnn2)
            reward = res.reward
            if self.cfg.reward_clip > 0:
                reward = jnp.clip(reward, -self.cfg.reward_clip,
                                  self.cfg.reward_clip)
            out = (obs, actions.astype(jnp.int32), logp, value, reward, res.done)
            return (res.state, new_obs, rnn2, rng), out

        (env_state, obs, rnn, rng), traj = jax.lax.scan(
            one_step, (ls.env_state, ls.obs, ls.carry, ls.rng), None,
            length=self.cfg.rollout,
        )
        batch = RolloutBatch(*traj, init_carry=init_carry)
        new_ls = ls._replace(
            env_state=env_state, obs=obs, carry=rnn, rng=rng,
            step=ls.step + self.cfg.rollout * self.num_envs,
        )
        return new_ls, batch

    # ------------------------------------------------- host-driven rollout
    # On tunneled dev TPUs a Pallas render inside lax.scan degrades to a
    # host round-trip per iteration (~100 ms; same pathology VectorEnv's
    # step_many avoids) — measured TowerBuilding training at ~4% of its
    # sampling throughput. The host-driven variant issues ONE fused jitted
    # dispatch per rollout step (policy + env step + render) from a Python
    # loop, then runs the jitted PPO update on the stacked trajectory.
    # Bit-compatible with the scan rollout (same ops per step, same order);
    # real TPUs keep the single-program scan (ParallelLearner gates).
    def _host_rollout_step_fn(self):
        if hasattr(self, "_host_step"):
            return self._host_step
        scen = self.scenario
        from megaverse_tpu.env import apply_deferred_resets, should_defer_reset

        defer = should_defer_reset(scen)
        vstep_mapped = jax.vmap(
            functools.partial(env_step, scen, render_obs=False,
                              defer_reset=defer), in_axes=(0, 0, 0, 0))

        def rollout_step(params, env_state, obs, rnn, rng, next_scenes,
                         shaping):
            rng, k = jax.random.split(rng)
            logits, value, rnn2 = self.model.apply(params, obs, rnn)
            actions, logp = sample_actions(logits, k)
            mask = multidiscrete_to_bitmask(actions)
            res = vstep_mapped(env_state, next_scenes, mask, shaping)
            if defer:
                res = res._replace(state=apply_deferred_resets(
                    res.state, next_scenes, res.done,
                    scen_fields=scen.deferred_scen_fields))
            new_obs = render_batch(scen, res.state, fmt="packed",
                                   bucket=self.render_bucket,
                                   backend=self.render_backend)
            rnn2 = jnp.where(res.done[:, None, None], 0.0, rnn2)
            reward = res.reward
            if self.cfg.reward_clip > 0:
                reward = jnp.clip(reward, -self.cfg.reward_clip,
                                  self.cfg.reward_clip)
            out = (actions.astype(jnp.int32), logp, value, reward, res.done)
            return (res.state, new_obs, rnn2, rng), out

        self._host_step = jax.jit(rollout_step)
        return self._host_step

    def train_step_host(self, ls: LearnerState, next_scenes: SceneData,
                        shaping: jax.Array):
        """train_step with the rollout driven from the host (tunnel mode)."""
        step_fn = self._host_rollout_step_fn()
        if not hasattr(self, "_update_jit"):
            self._update_jit = jax.jit(
                functools.partial(self._update_from_batch, axis_name=None))
        env_state, obs, rnn, rng = ls.env_state, ls.obs, ls.carry, ls.rng
        init_carry = ls.carry
        outs = []
        for _ in range(self.cfg.rollout):
            prev_obs = obs
            (env_state, obs, rnn, rng), out = step_fn(
                ls.params, env_state, prev_obs, rnn, rng, next_scenes,
                shaping)
            outs.append((prev_obs,) + out)
        traj = [jnp.stack(x) for x in zip(*outs)]
        batch = RolloutBatch(*traj, init_carry=init_carry)
        ls = ls._replace(
            env_state=env_state, obs=obs, carry=rnn, rng=rng,
            step=ls.step + self.cfg.rollout * self.num_envs)
        return self._update_jit(ls, batch)

    # ------------------------------------------------------------------ loss
    def _forward_sequence(self, params, batch: RolloutBatch):
        """Recompute logits/values over the rollout (truncated BPTT from the
        stored initial carry, APPO-style)."""
        def step(rnn, inp):
            obs_t, done_t = inp
            logits, value, rnn2 = self._policy(params, obs_t, rnn)
            rnn2 = jnp.where(done_t[:, None, None], 0.0, rnn2)
            return rnn2, (logits, value)

        _, (logits, values) = jax.lax.scan(
            step, batch.init_carry, (batch.obs, batch.done)
        )
        return logits, values

    def _gae(self, batch: RolloutBatch, last_value: jax.Array):
        """GAE advantages + returns over [T, B, A], computed once per
        rollout (PPO epochs/minibatches reuse them)."""
        cfg = self.cfg
        done_f = batch.done[..., None].astype(jnp.float32)  # [T, B, 1]

        def gae_step(carry, inp):
            gae, next_value = carry
            reward, value, done = inp
            nonterminal = 1.0 - done
            delta = reward + cfg.gamma * next_value * nonterminal - value
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            return (gae, value), gae

        (_, _), advantages = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value),
            (batch.reward, batch.value, done_f),
            reverse=True,
        )
        returns = advantages + batch.value
        adv_mean = jnp.mean(advantages)
        adv_std = jnp.std(advantages) + 1e-8
        norm_adv = (advantages - adv_mean) / adv_std
        return norm_adv, returns

    def _loss(self, params, batch: RolloutBatch, norm_adv, returns,
              progress=0.0):
        cfg = self.cfg
        logits, values = self._forward_sequence(params, batch)
        logp, entropy = action_log_prob_entropy(logits, batch.actions)
        ratio = jnp.exp(logp - batch.logp)
        clipped = jnp.clip(ratio, 1.0 - cfg.clip_ratio, 1.0 + cfg.clip_ratio)
        policy_loss = -jnp.mean(jnp.minimum(ratio * norm_adv, clipped * norm_adv))
        value_loss = 0.5 * jnp.mean((values - returns) ** 2)
        expl_loss = jnp.mean(symmetric_kl_from_uniform(logits))

        expl_coeff = cfg.exploration_coeff
        if cfg.exploration_final >= 0.0:
            expl_coeff = (cfg.exploration_coeff
                          + (cfg.exploration_final - cfg.exploration_coeff)
                          * jnp.clip(progress, 0.0, 1.0))
        total = (
            policy_loss
            + cfg.value_coeff * value_loss
            + expl_coeff * expl_loss
        )
        metrics = {
            "loss": total,
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "exploration_loss": expl_loss,
            "entropy": jnp.mean(entropy),
            "reward_mean": jnp.mean(batch.reward),
        }
        return total, metrics

    # ------------------------------------------------------------ train step
    def train_step(
        self,
        ls: LearnerState,
        next_scenes: SceneData,
        shaping: jax.Array,
        axis_name: Optional[str] = None,
    ):
        """One rollout + one PPO update. If axis_name is given, gradients are
        psum-averaged across that mesh axis (data parallelism over envs)."""
        ls, batch = self.collect_rollout(ls, next_scenes, shaping)
        return self._update_from_batch(ls, batch, axis_name)

    def _update_from_batch(self, ls: LearnerState, batch: RolloutBatch,
                           axis_name: Optional[str] = None):
        _, last_value, _ = self._policy(ls.params, ls.obs, ls.carry)
        norm_adv, returns = self._gae(batch, last_value)

        cfg = self.cfg
        n_mb = max(1, cfg.num_minibatches)
        params, opt_state = ls.params, ls.opt_state
        progress = (ls.step.astype(jnp.float32) / cfg.total_env_steps
                    if cfg.total_env_steps > 0 else 0.0)

        def update(params, opt_state, mb_batch, mb_adv, mb_ret):
            (loss, metrics), grads = jax.value_and_grad(
                self._loss, has_aux=True)(params, mb_batch, mb_adv, mb_ret,
                                          progress)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                metrics = jax.lax.pmean(metrics, axis_name)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, metrics

        if cfg.num_epochs <= 1 and n_mb <= 1:
            params, opt_state, metrics = update(params, opt_state, batch,
                                                norm_adv, returns)
        else:
            # Sequence-level minibatching (SF-style: whole rollouts per env,
            # truncated-BPTT state stays valid); env axis shuffled per epoch.
            b = self.num_envs
            assert b % n_mb == 0, (b, n_mb)
            rng = ls.rng
            take = lambda x, idx: jnp.take(x, idx, axis=1)
            metrics = None
            for _ in range(max(1, cfg.num_epochs)):
                rng, k = jax.random.split(rng)
                perm = jax.random.permutation(k, b)
                for m in range(n_mb):
                    idx = jax.lax.dynamic_slice_in_dim(perm, m * (b // n_mb),
                                                       b // n_mb)
                    mb_batch = RolloutBatch(
                        obs=take(batch.obs, idx),
                        actions=take(batch.actions, idx),
                        logp=take(batch.logp, idx),
                        value=take(batch.value, idx),
                        reward=take(batch.reward, idx),
                        done=take(batch.done, idx),
                        init_carry=jnp.take(batch.init_carry, idx, axis=0),
                    )
                    params, opt_state, metrics = update(
                        params, opt_state, mb_batch,
                        take(norm_adv, idx), take(returns, idx))
            ls = ls._replace(rng=rng)
        ls = ls._replace(params=params, opt_state=opt_state)
        return ls, metrics
