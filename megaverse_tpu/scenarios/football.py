"""Football scenario (experimental in the reference; no rewards).

ref: scenarios/src/scenario_football.cpp. A walled room (14-24 x 12-24) with a
dynamic ball (Bullet sphere, r=2 scaled 0.5 -> world radius 1, mass 1); agents
kick it with Interact within 1.8 m, applying a 70 N force with an upward bias
(step, cpp:143-164).

The ball is an IMPULSE-BASED rigid body (linear + angular velocity) against
the static voxel world, mirroring Bullet's sequential-impulse contact model
and the reference's exact constants (DynamicRigidBody ctor, cpp:27-100 +
Bullet defaults the reference never overrides):
 - world gravity (0, -10, 0): the env never calls setGravity, so Bullet's
   btDiscreteDynamicsWorld default applies (NOT the KCC's 1.4*9.8, which is
   private to the character controller);
 - restitution 0 (m_restitution never set -> Bullet default): the ball does
   not bounce, it lands and rolls;
 - combined sliding friction 0.25 (ball 0.5 x static-world default 0.5,
   btManifoldResult::calculateCombinedFriction);
 - combined rolling/spinning friction 0.05 (0.1 * 0.5 + 0 * 0.5,
   calculateCombinedRollingFriction);
 - inertia 1.6: calculateLocalInertia runs on the UNSCALED btSphereShape(2)
   (0.4 * m * r^2 with r=2) before the 0.5 local scaling is applied — a
   Bullet quirk the reference inherits, so the ball spins up as if r=2 while
   contacting at r=1.

Per contact (floor / ceiling / 4 axis walls, detected by voxel probes):
normal impulse kills the approach velocity (e=0) with positional projection,
a tangential friction impulse (clamped at mu * normal impulse, coupling
v and omega through the contact arm) drives the slide -> roll transition,
and rolling friction decays omega under the same impulse budget.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from megaverse_tpu import constants as C
from megaverse_tpu.ops import grid as G
from megaverse_tpu.scenarios import register_scenario
from megaverse_tpu.scenarios.base import HostScene, Scenario
from megaverse_tpu.types import EnvState, GridConfig, SceneData

BALL_RADIUS = 1.0    # btSphereShape(2.0) scaled 0.5
BALL_MASS = 1.0
BALL_INERTIA = 1.6   # 0.4 * m * 2^2: computed on the UNSCALED shape (Bullet quirk)
GRAVITY = 10.0       # btDiscreteDynamicsWorld default (never overridden)
MU = 0.25            # combined sliding friction 0.5 * 0.5
MU_ROLL = 0.05       # combined rolling friction 0.1 * 0.5 + 0 * 0.5


class FootballState(struct.PyTreeNode):
    ball_pos: jax.Array    # f32 [3]
    ball_vel: jax.Array    # f32 [3]
    ball_omega: jax.Array  # f32 [3] angular velocity (rad/s)
    ball_prop: jax.Array   # i32


class FootballScenario(Scenario):
    name = "Football"
    max_boxes = 16
    prop_segments = ((C.PROP_SPHERE, 1),)

    def grid_config(self) -> GridConfig:
        return GridConfig(dims=(24, 10, 24), voxel_size=1.0, origin=(0.0, 0.0, 0.0))

    def _reward_shaping(self) -> Dict[str, float]:
        return {}

    def generate(self, rng: np.random.Generator) -> SceneData:
        rr = lambda lo, hi: int(rng.integers(lo, hi))
        length = rr(14, 24)
        width = rr(12, 24)
        height = rr(3, 7)
        positions = self._spawn_points(length, width, rr)
        yaws = [rng.random() * 2 * np.pi for _ in range(self.num_agents)]
        return self._build(length, width, height, positions, yaws)

    supports_ref_stream = True

    def generate_ref(self, rng) -> SceneData:
        """Reference draw order (FootballLayout::init, scenario_football.cpp:
        16-22: length/width/height; Platform::agentSpawnPoints occupancy
        sampling, platforms.hpp:221-244; then spawnAgents yaws)."""
        from megaverse_tpu.utils.refrng import ref_spawn_yaw

        length = rng.rand_range(14, 24)
        width = rng.rand_range(12, 24)
        height = rng.rand_range(3, 7)
        positions = self._spawn_points(length, width, rng.rand_range)
        yaws = [ref_spawn_yaw(rng) for _ in range(self.num_agents)]
        return self._build(length, width, height, positions, yaws)

    def _spawn_points(self, length, width, rr):
        # Platform::agentSpawnPoints (platforms.hpp:221-244): <=10 attempts
        # per agent; retries on used cells consume draws.
        used, occupancy, positions = set(), {}, []
        for _ in range(self.num_agents):
            for _att in range(10):
                x = rr(1, length - 1)
                z = rr(1, width - 1)
                if (x, z) in used:
                    continue
                y = occupancy.get((x, z), 0) + 1
                occupancy[(x, z)] = occupancy.get((x, z), 0) + 2
                positions.append([x, y, z])
                used.add((x, z))
                break
        while len(positions) < self.num_agents:
            positions.append(positions[0])
        return positions

    def _build(self, length, width, height, positions, yaws) -> SceneData:
        scene = HostScene(self.cfg)
        white = C.COLOR_IDX["WHITE"]

        scene.vtype[0:length, 0, 0:width] |= C.VOXEL_SOLID | C.VOXEL_OPAQUE
        scene.vcolor[0:length, 0, 0:width] = white
        for (xs, zs) in ((np.s_[0:1], np.s_[0:width]), (np.s_[length - 1:length], np.s_[0:width]),
                         (np.s_[0:length], np.s_[0:1]), (np.s_[0:length], np.s_[width - 1:width])):
            scene.vtype[xs, 0:height, zs] |= C.VOXEL_SOLID | C.VOXEL_OPAQUE
            scene.vcolor[xs, 0:height, zs] = white

        ball_pos = np.array([5.0, 5.0, 5.0], np.float32)
        prop = scene.add_prop(C.PROP_SPHERE, ball_pos, (0.5, 0.5, 0.5),
                              C.COLOR_IDX["ORANGE"])

        scene.spawn_agents_at(np.asarray(positions, np.float64), None,
                              yaws=np.asarray(yaws, np.float32))

        scen = FootballState(
            ball_pos=ball_pos,
            ball_vel=np.zeros(3, np.float32),
            ball_omega=np.zeros(3, np.float32),
            ball_prop=np.int32(prop),
        )
        return scene.finish(self.max_boxes, scen=scen)

    def scen_step(self, state: EnvState, action: jax.Array, shaping: jax.Array):
        num_agents = self.num_agents
        cfg = self.cfg.grid
        dt = self.cfg.dt
        sc: FootballState = state.scen

        # kicks (cpp:143-164): force 70 N for one tick on a 1 kg ball
        t = state.agents.pos + jnp.asarray([0.0, C.AGENT_BODY_OFFSET_Y, 0.0])
        delta = sc.ball_pos[None, :] - t
        dist = jnp.linalg.norm(delta, axis=-1)
        kick = ((action & C.ACTION_INTERACT) != 0) & (dist < 1.8)
        dir_ = delta / jnp.maximum(dist[:, None], 1e-6)
        dir_ = dir_.at[:, 1].set(0.5)
        impulse = jnp.sum(jnp.where(kick[:, None], 70.0 * dir_ * dt, 0.0), axis=0)
        vel = sc.ball_vel + impulse

        # agent contacts: the reference ball is a Bullet dynamic body, so a
        # kinematic agent walking into it pushes it out of penetration
        # (capsule r=0.33 vs sphere r=1). Horizontal-only resolution, summed
        # over contacting agents.
        body = state.agents.pos + jnp.asarray([0.0, C.AGENT_HALF_HEIGHT, 0.0])
        dxz = sc.ball_pos[None, ::2] - body[:, ::2]
        dh = jnp.linalg.norm(dxz, axis=-1)
        overlap_v = jnp.abs(sc.ball_pos[1] - body[:, 1]) < (
            C.AGENT_HALF_HEIGHT + BALL_RADIUS)
        pen = (BALL_RADIUS + C.AGENT_CAPSULE_RADIUS) - dh
        touching = (pen > 0.0) & overlap_v
        push_dir = dxz / jnp.maximum(dh[:, None], 1e-6)
        push = jnp.sum(
            jnp.where(touching[:, None], push_dir * pen[:, None], 0.0), axis=0)
        pos0 = sc.ball_pos.at[0].add(push[0]).at[2].add(push[1])
        # impart momentum: depenetration velocity, capped at walk speed
        push_v = jnp.clip(push / dt, -C.KCC_MAX_HORIZONTAL_SPEED,
                          C.KCC_MAX_HORIZONTAL_SPEED)
        vel = vel.at[0].add(push_v[0]).at[2].add(push_v[1])

        # --- impulse-based rigid-body integration vs the static voxel world
        # (see module docstring for the Bullet constants being mirrored) ---
        omega = sc.ball_omega
        vel = vel - jnp.asarray([0.0, GRAVITY * dt, 0.0])
        pos = pos0 + vel * dt

        def contact(pos, vel, omega, n):
            """Resolve one axis-aligned contact with normal n (unit, toward
            the ball). Sequential impulse: normal (e=0) + positional
            projection, then friction (couples v and omega through the
            contact arm), then rolling friction under the same budget."""
            axis = int(np.argmax(np.abs(n)))
            sign = float(n[axis])
            n = jnp.asarray(n, jnp.float32)
            # probe the voxel just past the contact point
            probe = G.world_to_voxel(cfg, pos - n * (BALL_RADIUS + 1e-3))
            hit = G.solid_from_cols(cfg, state.cols, probe[None, :])[0]
            plane = (probe[axis] + (sign > 0)).astype(jnp.float32) \
                * cfg.voxel_size + cfg.origin[axis]
            # pen > 0 means overlap along n (s>0: plane+R-pos; s<0: pos-plane+R)
            pen = sign * (plane - pos[axis]) + BALL_RADIUS
            hit = hit & (pen > -1e-3)

            v_n = jnp.dot(vel, n)
            j_n = jnp.where(hit, jnp.maximum(-v_n, 0.0) * BALL_MASS, 0.0)
            # resting-contact budget: the normal impulse that cancels this
            # tick's gravity (Bullet's solver produces it every step)
            j_rest = BALL_MASS * GRAVITY * dt * jnp.abs(n[1])
            j_budget = j_n + jnp.where(hit, j_rest, 0.0)
            vel = vel + n * (j_n / BALL_MASS)
            # positional projection out of penetration
            pos = pos + n * jnp.where(hit, jnp.maximum(pen, 0.0), 0.0)

            # friction at the contact point: r_c = -n * R (center -> contact)
            r_c = -n * BALL_RADIUS
            v_cp = vel + jnp.cross(omega, r_c)
            v_t = v_cp - n * jnp.dot(v_cp, n)
            sp = jnp.linalg.norm(v_t)
            t_hat = v_t / jnp.maximum(sp, 1e-9)
            # effective mass along the tangent (sphere: arm perp to tangent)
            k = 1.0 / BALL_MASS + BALL_RADIUS * BALL_RADIUS / BALL_INERTIA
            j_t = jnp.minimum(sp / k, MU * j_budget)
            j_t = jnp.where(hit & (sp > 1e-6), j_t, 0.0)
            vel = vel - t_hat * (j_t / BALL_MASS)
            omega = omega - jnp.cross(r_c, t_hat * j_t) / BALL_INERTIA

            # rolling friction: torque impulse <= mu_roll * j_n against omega
            w = jnp.linalg.norm(omega)
            dw = jnp.where(hit, jnp.minimum(w, MU_ROLL * j_budget
                                            * BALL_RADIUS / BALL_INERTIA), 0.0)
            omega = omega - omega / jnp.maximum(w, 1e-9) * dw
            return pos, vel, omega

        # floor first (the dominant contact), then the four walls, then the
        # (rare) ceiling — the unrolled sequential-impulse pass
        for n in ((0, 1, 0), (1, 0, 0), (-1, 0, 0),
                  (0, 0, 1), (0, 0, -1), (0, -1, 0)):
            pos, vel, omega = contact(pos, vel, omega, n)

        props = state.props.replace(pos=state.props.pos.at[sc.ball_prop].set(pos))
        sc = sc.replace(ball_pos=pos, ball_vel=vel, ball_omega=omega)
        state = state.replace(props=props, scen=sc,
                              true_objective=jnp.zeros((num_agents,), jnp.float32))
        return state, jnp.zeros((num_agents,), jnp.float32)


register_scenario("Football", FootballScenario)
