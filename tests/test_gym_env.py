"""Reference-compatible gym API tests (mirrors megaverse/tests/test_env.py)."""

import numpy as np
import pytest

import megaverse_tpu.constants as C
from megaverse_tpu.gym_env import (
    MEGAVERSE8,
    MegaverseEnv,
    make_env_multitask,
    set_megaverse_log_level,
)


def test_megaverse8_list():
    assert MEGAVERSE8 == ["TowerBuilding", "ObstaclesEasy", "ObstaclesHard",
                          "Collect", "Sokoban", "HexMemory", "HexExplore",
                          "Rearrange"]


def test_lifecycle_and_shapes():
    set_megaverse_log_level(2)
    env = MegaverseEnv("Empty", num_envs=2, num_agents_per_env=2)
    env.seed(3)
    obs = env.reset()
    assert len(obs) == 4
    assert obs[0].shape == (3, 72, 128)
    assert obs[0].dtype == np.uint8

    acts = [np.zeros(6, np.int64) for _ in range(4)]
    obs, rewards, dones, infos = env.step(acts)
    assert len(obs) == len(rewards) == len(dones) == len(infos) == 4
    env.close()


def test_true_reward_in_info_on_done():
    env = MegaverseEnv("Empty", num_envs=1, num_agents_per_env=1,
                       params={C.P_EPISODE_LENGTH_SEC: 0.5})
    env.reset()
    acts = [np.zeros(6, np.int64)]
    saw_done = False
    for _ in range(10):
        obs, rew, dones, infos = env.step(acts)
        if dones[0]:
            saw_done = True
            assert "true_reward" in infos[0]
            break
    assert saw_done


def test_reward_shaping_passthrough():
    env = MegaverseEnv("Collect", num_envs=1, num_agents_per_env=2)
    env.reset()
    default = env.get_default_reward_shaping()
    assert "collectSingleGood" in default
    rs = dict(default)
    rs["collectSingleGood"] = 2.5
    env.set_reward_shaping(rs, actor_idx=1)
    assert env.get_current_reward_shaping(1)["collectSingleGood"] == 2.5
    assert env.get_current_reward_shaping(0)["collectSingleGood"] == 1.0


def test_multitask_factory_rotation():
    names = []
    for i in range(len(MEGAVERSE8)):
        env = make_env_multitask("multitask_megaverse8", i, 1, 1)
        names.append(env.scenario_name)
        env.close()
    assert names == [n.casefold() for n in MEGAVERSE8]


def test_render_returns_tiled_image():
    env = MegaverseEnv("Empty", num_envs=1, num_agents_per_env=2)
    env.reset()
    img = env.render()
    assert img.shape == (72, 2 * 128, 3)


def test_external_trainer_wrapper():
    """MegaverseWrapper: SF-style shaping/training-info interfaces + episode
    stats + team-spirit annealing (ref megaverse_utils.py:30-90)."""
    from megaverse_tpu.rl.wrappers import MegaverseWrapper

    env = MegaverseEnv("Empty", num_envs=1, num_agents_per_env=2,
                       params={C.P_EPISODE_LENGTH_SEC: 0.5})
    w = MegaverseWrapper(env, increase_team_spirit=True,
                         max_team_spirit_steps=100.0)
    w.set_training_info({"approx_total_training_steps": 50})
    obs, info0 = w.reset()
    assert len(obs) == 2 and info0 == {}

    acts = [np.zeros(6, np.int64)] * 2
    saw_done = False
    for _ in range(12):
        obs, rew, dones, trunc, infos = w.step(acts)
        assert trunc == [False, False]
        if dones[0]:
            saw_done = True
            extra = infos[0]["episode_extra_stats"]
            assert "true_objective" in infos[0]
            assert "z_empty_reward" in extra
            assert extra["z_approx_total_training_steps"] == 50
            # annealed teamSpirit = 50/100
            assert abs(w.get_current_reward_shaping(0)["teamSpirit"] - 0.5) < 1e-6
            break
    assert saw_done
    # episode reward accumulator resets on done
    assert w.episode_rewards == [0.0, 0.0]
    w.close()


def test_make_megaverse_factory():
    from megaverse_tpu.rl.wrappers import make_megaverse

    w = make_megaverse("Empty")
    obs, _ = w.reset()
    assert len(obs) == 1
    w.close()
