"""Numpy simulation of the Pallas renderer's culling pipeline: for a real
scene batch, measure per-tile how many superclusters/clusters/rows survive
each culling stage, and the optimistic lower bound (rows reachable given the
FINAL per-ray depths). Tells us whether further speedup lives in traversal
(survivors >> visible) or in per-row cost (survivors ~= visible).

Usage: python scripts/analyze_culling.py --scenario Collect [--num_envs 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var is ignored in-container

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402


def ray_dirs(h, w, yaw, pitch, fov_deg):
    rows = np.arange(h)[:, None] + 0.5
    cols = np.arange(w)[None, :] + 0.5
    tan_h = np.tan(np.deg2rad(fov_deg / 2))
    tan_v = tan_h * h / w
    u = (cols / w * 2 - 1) * tan_h
    v = (1 - rows / h * 2) * tan_v
    inv = 1.0 / np.sqrt(u * u + v * v + 1)
    d0 = np.stack(np.broadcast_arrays(u * inv, v * inv, -inv + 0 * u), -1)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    y1 = cp * d0[..., 1] - sp * d0[..., 2]
    z1 = sp * d0[..., 1] + cp * d0[..., 2]
    dx = cy * d0[..., 0] + sy * z1
    dz = -sy * d0[..., 0] + cy * z1
    return np.stack([dx, y1, dz], -1)  # [h, w, 3]


def slab(eye, d, lo, hi):
    """eye [3], d [R,3], lo/hi [M,3] -> tmin,tmax [R,M]"""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)  # [R,3]
    t1 = (lo[None] - eye) * inv[:, None]  # [R,M,3]
    t2 = (hi[None] - eye) * inv[:, None]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    return tmin, tmax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="Collect")
    p.add_argument("--num_envs", type=int, default=8)
    p.add_argument("--num_agents", type=int, default=1)
    args = p.parse_args()

    from megaverse_tpu.vector_env import VectorEnv
    from megaverse_tpu.ops import raycast_pallas as RP
    from megaverse_tpu import constants as C

    env = VectorEnv(args.scenario, num_envs=args.num_envs,
                    num_agents_per_env=args.num_agents, seed=7, render=False)
    env.reset()
    states = env.state
    cfg = env.scenario.cfg
    h, w = cfg.obs_height, cfg.obs_width
    include_agents = cfg.num_agents > 1

    prims = jax.vmap(lambda s: RP.build_prim_table(
        cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents,
        include_agent_rows=include_agents))(states)
    prims, clusters = jax.vmap(RP.build_clusters)(prims)
    clusters, sclusters = jax.vmap(RP.build_superclusters)(clusters)
    prims = np.asarray(prims)
    clusters = np.asarray(clusters)
    sclusters = np.asarray(sclusters)
    agents_pos = np.asarray(states.agents.pos)
    agents_yaw = np.asarray(states.agents.yaw)
    agents_pitch = np.asarray(states.agents.pitch)

    M = prims.shape[1]
    G = clusters.shape[1]
    K = RP.CLUSTER_K
    if M < G * K:  # build_clusters pads rows to a multiple of CLUSTER_K,
        pad = np.zeros((prims.shape[0], G * K - M, prims.shape[2]), prims.dtype)
        pad[..., 0] = -1.0
        prims = np.concatenate([prims, pad], axis=1)
        M = G * K
    S = sclusters.shape[1]
    live = prims[..., 0] >= 0
    print(f"{args.scenario}: table rows={M} (live mean {live.sum(1).mean():.0f} "
          f"max {live.sum(1).max()}), clusters={G}, superclusters={S}")

    TH = 8
    ntiles = h // TH
    stats = {k: [] for k in ["sc_frustum", "cl_frustum", "rows_frustum",
                             "sc_final", "cl_final", "rows_final",
                             "rows_visible"]}
    for b in range(args.num_envs):
        for a in range(args.num_agents):
            eye = agents_pos[b, a] + np.array(
                [0.0, C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y, 0.0])
            d = ray_dirs(h, w, agents_yaw[b, a], agents_pitch[b, a],
                         C.CAMERA_FOV_DEG)  # [h,w,3]
            dr = d.reshape(-1, 3)
            tmin_c, tmax_c = slab(eye, dr, clusters[b, :, 0:3], clusters[b, :, 3:6])
            tmin_s, tmax_s = slab(eye, dr, sclusters[b, :, 0:3], sclusters[b, :, 3:6])
            # exact closest hit over AABB rows (type 0) for depth bound
            box = prims[b, :, 0] == 0
            tmin_r, tmax_r = slab(eye, dr, prims[b, box, 1:4], prims[b, box, 4:7])
            hit = (tmax_r >= tmin_r) & (tmin_r > C.CAMERA_NEAR)
            t = np.where(hit, tmin_r, np.inf)
            depth = t.min(1).reshape(h, w)  # ignores props: optimistic-ish
            depth = np.minimum(depth, C.CAMERA_FAR)

            for ti in range(ntiles):
                sl = slice(ti * TH * w, (ti + 1) * TH * w)
                dtile = depth[ti * TH:(ti + 1) * TH].max() + 0.01

                def reach(tmin, tmax, bound):
                    return ((tmax[sl] >= tmin[sl]) & (tmax[sl] > 0)
                            & (tmin[sl] < bound)).any(0)

                scf = reach(tmin_s, tmax_s, C.CAMERA_FAR)
                clf = reach(tmin_c, tmax_c, C.CAMERA_FAR)
                stats["sc_frustum"].append(scf.sum())
                stats["cl_frustum"].append(clf.sum())
                stats["rows_frustum"].append(
                    (clf.reshape(-1)[:, None] & live[b].reshape(G, -1)).sum())
                scd = reach(tmin_s, tmax_s, dtile)
                cld = reach(tmin_c, tmax_c, dtile)
                stats["sc_final"].append(scd.sum())
                stats["cl_final"].append(cld.sum())
                stats["rows_final"].append(
                    (cld.reshape(-1)[:, None] & live[b].reshape(G, -1)).sum())
                # rows whose tmin equals some pixel's final depth (winners)
                wt = t[sl]
                vis = (wt <= depth[ti * TH:(ti + 1) * TH].reshape(-1, 1) + 1e-6).any(0)
                stats["rows_visible"].append(vis.sum())

    for k, v in stats.items():
        v = np.array(v, np.float64)
        print(f"{k:14s} mean {v.mean():7.1f}  p90 {np.percentile(v, 90):7.1f}  "
              f"max {v.max():7.0f}")


if __name__ == "__main__":
    main()
