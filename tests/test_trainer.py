"""Trainer orchestration tests: checkpoint/resume semantics, metric flow,
best-eval saving (reference behaviors: train.py:107-132, ppo.py:101-103)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.training import ppo
from carla_ppo_tpu.training.loop import Trainer, TrainerSettings


@pytest.fixture()
def small(tmp_path):
    settings = TrainerSettings(
        model_name="t0",
        models_root=str(tmp_path),
        num_iterations=3,
        eval_interval=2,
        eval_envs=2,
        checkpoint_interval=2,
        record_eval=False,
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)
    return settings, config


def test_train_loop_runs_and_checkpoints(small):
    settings, config = small
    trainer = Trainer(settings, config)
    metrics = trainer.train()
    assert trainer.iteration == 3
    assert np.isfinite(metrics["train_loss/loss"])
    # Eval at it=0 saved a best checkpoint; periodic at it=2.
    assert trainer.checkpointer.latest_step() is not None
    trainer.close()


def test_resume_continues_counters(small):
    settings, config = small
    t1 = Trainer(settings, config)
    t1.train()
    assert t1.iteration == 3
    t1.checkpointer.save(3, t1.train_state)
    t1.close()

    # Fresh trainer on the same dirs resumes at iteration 3 (reference resume:
    # counters are part of the saved state, ppo.py:101-103 + train.py:111-118).
    t2 = Trainer(settings, config)
    assert t2.iteration == 3
    # Params identical to what t1 ended with.
    a = jax.tree.leaves(t1.train_state.params)[0]
    b = jax.tree.leaves(t2.train_state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.train(num_iterations=5)
    assert t2.iteration == 5
    t2.close()


def test_restart_deletes_model_dir(small, tmp_path):
    settings, config = small
    t1 = Trainer(settings, config)
    t1.train()
    t1.checkpointer.save(99, t1.train_state)
    t1.close()
    t2 = Trainer(settings, config, restart=True)
    assert t2.iteration == 0  # wiped (reference: train.py:107-110)
    t2.close()


def test_tensorboard_logs_written(small, tmp_path):
    settings, config = small
    trainer = Trainer(settings, config)
    trainer.train()
    trainer.close()
    logs = os.listdir(trainer.log_dir)
    assert any("tfevents" in f for f in logs)


def test_nan_guard_rolls_back(small, monkeypatch):
    """A poisoned iteration must not advance params (failure detection)."""
    settings, config = small
    settings = type(settings)(**{**settings.__dict__, "model_name": "t_nan",
                                 "num_iterations": 2, "eval_interval": 100})
    trainer = Trainer(settings, config)
    import numpy as np

    calls = {"n": 0}
    real = ppo.train_iteration

    def poisoned(*args, **kwargs):
        ts, envs, m = real(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 1:
            m = dict(m)
            m["train_loss/loss"] = jnp.float32(np.nan)
        return ts, envs, m

    monkeypatch.setattr(ppo, "train_iteration", poisoned)
    params_before = jax.tree.leaves(trainer.train_state.params)[0].copy()
    trainer.train()
    # First (poisoned) iteration skipped: only iteration 2's update applied;
    # the run completed without propagating NaN.
    leaf = jax.tree.leaves(trainer.train_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    assert trainer._nan_events == 1
    trainer.close()


def test_pixel_trainer_end_to_end(tmp_path):
    """--obs pixels through the product Trainer: train, eval, checkpoint,
    resume (VERDICT round-2 item 1: pixels as a first-class driver path)."""
    settings = TrainerSettings(
        model_name="px",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=1,
        eval_envs=2,
        eval_max_steps=4,
        checkpoint_interval=1,
        obs="pixels",
    )
    config = ppo.PPOConfig(horizon=4, num_envs=4, num_minibatches=2)
    t = Trainer(settings, config)
    assert t.obs_mode == "pixels"
    metrics = t.train()
    assert t.iteration == 2
    assert np.isfinite(metrics["train_loss/loss"])
    assert "train_loss/vae_recon" in metrics  # joint-VAE aux loss active
    assert "train_grad/encoder_norm" in metrics  # collapse diagnostics
    t.close()

    t2 = Trainer(settings, config)
    assert t2.iteration == 2  # resumed from autosave
    t2.close()


def test_pixel_trainer_with_npc_traffic(tmp_path):
    """Pixels + traffic composition (round-4 VERDICT item 5): --obs pixels
    with num_npcs > 0 trains through the product Trainer with NPC billboards
    rendered into the observation frames and real collision termination on -
    the camera + moving-actors stack the reference deploys but never trains
    (reference: carla_lap_env.py:175-178 camera, wrappers.py:85-115 collision
    sensor)."""
    settings = TrainerSettings(
        model_name="pxnpc",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=1,
        eval_envs=2,
        eval_max_steps=4,
        checkpoint_interval=2,
        obs="pixels",
        num_npcs=2,
        reward_fn="reward_traffic_add",
    )
    config = ppo.PPOConfig(horizon=4, num_envs=4, num_minibatches=2)
    t = Trainer(settings, config)
    assert t.obs_mode == "pixels"
    assert bool(t.env_params.terminate_on_collision)
    assert bool(t.env_params.render_npc_billboards)
    metrics = t.train()
    assert t.iteration == 2
    assert np.isfinite(metrics["train_loss/loss"])
    t.close()


def test_pixel_trainer_dp(tmp_path):
    """--obs pixels --num_devices 8: the dp pixel iteration drives through
    the Trainer on the virtual mesh."""
    settings = TrainerSettings(
        model_name="px_dp",
        models_root=str(tmp_path),
        num_iterations=1,
        eval_interval=100,
        checkpoint_interval=0,
        num_devices=8,
        obs="pixels",
    )
    config = ppo.PPOConfig(horizon=2, num_envs=8, num_minibatches=1,
                           num_epochs=1)
    t = Trainer(settings, config)
    metrics = t.train()
    assert np.isfinite(metrics["train_loss/loss"])
    t.close()


def test_schedules_change_phase(tmp_path):
    """lr/entropy schedules switch at their iteration boundaries inside the
    compiled program (VERDICT round-2 item 8: turnkey multi-phase recipes)."""
    settings = TrainerSettings(
        model_name="sched",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=100,
        checkpoint_interval=0,
    )
    config = ppo.PPOConfig(
        horizon=4, num_envs=4, num_minibatches=2,
        lr_schedule=((0, 3e-4), (2, 1e-4)),
        entropy_schedule=((0, 0.01), (2, 0.002)),
    )
    t = Trainer(settings, config)
    t.train(num_iterations=1)
    m1 = t.train(num_iterations=2)
    assert m1["train/learning_rate"] == pytest.approx(3e-4)
    assert m1["train/entropy_scale"] == pytest.approx(0.01)
    m2 = t.train(num_iterations=3)
    assert m2["train/learning_rate"] == pytest.approx(1e-4)
    assert m2["train/entropy_scale"] == pytest.approx(0.002)
    t.close()


def test_best_stream_restore_beats_resume_choice(small):
    """run_eval's --checkpoint best contract: a fresh Trainer resumes the
    NEWEST state across best+autosave streams, but the best-eval stream's
    newest entry (its highest scorer - it only grows on improvement) is
    recoverable via checkpointer.restore_latest, even when the autosave is
    newer (the post-peak final state the reference's run_eval must NOT
    evaluate; reference: train.py:130-132 save-on-best)."""
    settings, config = small
    t1 = Trainer(settings, config)
    t1.train()  # best saved at it 0/2 evals; autosave at it=2
    best_it = t1.checkpointer.latest_step()
    # Age the autosave ahead of the best stream.
    t1.train_state = t1.train_state.replace(
        iteration=jnp.int32(int(t1.train_state.iteration) + 10)
    )
    t1.autosaver.save(int(t1.train_state.iteration), t1.train_state)
    t1.close()

    t2 = Trainer(settings, config)  # resume: picks the newer autosave
    assert int(t2.train_state.iteration) == best_it + 10 + 3 or int(
        t2.train_state.iteration
    ) > best_it
    best = t2.checkpointer.restore_latest(t2.train_state)
    assert best is not None
    assert int(best.iteration) <= best_it  # the best-stream entry, not autosave
    t2.close()


def test_freeze_on_solve_engages_and_holds(tmp_path, monkeypatch):
    """Solve-aware freeze (the production post-solve stability mechanism):
    once eval reports >= solve_laps for freeze_on_solve consecutive evals,
    later iterations apply NO update (params bit-identical); an eval below
    the bar unfreezes."""
    import jax
    import jax.numpy as jnp

    settings = TrainerSettings(
        model_name="fz",
        models_root=str(tmp_path),
        num_iterations=4,
        eval_interval=1,
        eval_envs=2,
        checkpoint_interval=100,
        freeze_on_solve=2,
        solve_laps=3.0,
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)
    trainer = Trainer(settings, config)

    fake_laps = {"v": 3.0}

    real_eval = Trainer.evaluate

    def fake_evaluate(self):
        m = real_eval(self)
        m["eval/laps_completed"] = fake_laps["v"]
        return m

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)

    params_before = {}

    trainer.train(num_iterations=1)  # eval at it=0: streak 1, not frozen yet
    assert not trainer._frozen
    trainer.train(num_iterations=2)  # eval at it=1: streak 2 -> frozen
    assert trainer._frozen
    params_before = jax.tree.map(np.asarray, trainer.train_state.params)
    trainer.train(num_iterations=3)  # frozen iteration applies nothing
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        params_before, trainer.train_state.params,
    )
    # An eval below the bar unfreezes and training resumes.
    fake_laps["v"] = 0.5
    trainer.train(num_iterations=4)
    assert not trainer._frozen
    trainer.close()


def test_best_score_persists_across_resume(tmp_path, monkeypatch):
    """A resumed run must not reset the best-eval score: the best-only
    checkpoint stream would otherwise admit worse post-resume entries and
    run_eval's 'best' (newest best-stream entry) would regress."""
    settings = TrainerSettings(
        model_name="bs",
        models_root=str(tmp_path),
        num_iterations=1,
        eval_interval=1,
        eval_envs=2,
        checkpoint_interval=100,
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)

    laps = {"v": 3.0}
    real_eval = Trainer.evaluate

    def fake_evaluate(self):
        m = real_eval(self)
        m["eval/laps_completed"] = laps["v"]
        return m

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)

    t1 = Trainer(settings, config)
    t1.train(num_iterations=1)  # eval at it=0 scores (3.0, r) -> saved
    best_step = t1.checkpointer.latest_step()
    assert t1.best_eval_score[0] == 3.0
    t1.close()

    # Resume with WORSE eval: must restore the score and save nothing new.
    laps["v"] = 0.5
    t2 = Trainer(settings, config)
    assert t2.best_eval_score[0] == 3.0
    t2.train(num_iterations=2)
    assert t2.checkpointer.latest_step() == best_step
    t2.close()


def test_best_key_finished_first(tmp_path, monkeypatch):
    """finished_first ranks concluded-episode evals above budget-survivors:
    a 13.8 km/h crawler farming the eval budget must not outrank a faster
    agent whose episodes actually end (RESULTS_round3.md traffic artifact)."""
    settings = TrainerSettings(
        model_name="bk",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=1,
        eval_envs=2,
        checkpoint_interval=100,
        best_key="finished_first",
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)

    evals = [
        # it=0: crawler - high laps, survived the budget (finished 0).
        {"eval/finished": 0.0, "eval/laps_completed": 2.86, "eval/reward": 900.0},
        # it=1: honest driver - fewer laps but episodes concluded.
        {"eval/finished": 1.0, "eval/laps_completed": 1.5, "eval/reward": 50.0},
    ]
    real_eval = Trainer.evaluate

    def fake_evaluate(self):
        m = real_eval(self)
        m.update(evals.pop(0))
        return m

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)
    t = Trainer(settings, config)
    t.train()
    # The finisher (it=1) must hold the best slot despite fewer laps.
    assert t.best_eval_score == (1.0, 1.5, 50.0)
    assert t.checkpointer.latest_step() == 1
    t.close()


def test_best_key_finished_overtakes(tmp_path, monkeypatch):
    """finished_overtakes ranks completed overtakes above reward: a pacing
    agent that finishes by queueing NPCs behind itself (0 overtakes, HIGH
    reward - positive per-step reward pays slow finishers more) must not
    outrank a finisher that actually passes traffic (round-4 finding)."""
    settings = TrainerSettings(
        model_name="bko",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=1,
        eval_envs=2,
        checkpoint_interval=100,
        best_key="finished_overtakes",
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)

    evals = [
        # it=0: pacer - finished, 3 laps, zero overtakes, huge reward.
        {"eval/finished": 1.0, "eval/laps_completed": 3.0,
         "eval/overtakes": 0.0, "eval/reward": 69000.0},
        # it=1: overtaker - finished, 3 laps, passes traffic, less reward.
        {"eval/finished": 1.0, "eval/laps_completed": 3.0,
         "eval/overtakes": 4.5, "eval/reward": 52000.0},
    ]
    real_eval = Trainer.evaluate

    def fake_evaluate(self):
        m = real_eval(self)
        m.update(evals.pop(0))
        return m

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)
    t = Trainer(settings, config)
    t.train()
    assert t.best_eval_score == (1.0, 3.0, 4.5, 52000.0)
    assert t.checkpointer.latest_step() == 1
    t.close()


def test_reward_param_overrides(tmp_path):
    """The reward-shape overrides land in EnvParams.reward; unset fields
    keep RewardParams defaults."""
    settings = TrainerSettings(
        model_name="rpov",
        models_root=str(tmp_path),
        num_iterations=0,
        reward_min_speed=20.0,
        reward_target_speed=24.0,
        pass_bonus=40.0,
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)
    t = Trainer(settings, config)
    rp = t.env_params.reward
    assert float(rp.min_speed) == 20.0
    assert float(rp.target_speed) == 24.0
    assert float(rp.pass_bonus) == 40.0
    # untouched fields keep their defaults
    assert float(rp.max_speed) == 25.0
    assert float(rp.max_distance) == 3.0
    t.close()


def test_best_key_length_mismatch_resets_bar(tmp_path, monkeypatch):
    """Switching best_key against an existing best_score.json starts the bar
    fresh instead of comparing tuples with different semantics."""
    import json

    settings = TrainerSettings(
        model_name="bk2",
        models_root=str(tmp_path),
        num_iterations=0,
        best_key="finished_first",
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)
    model_dir = os.path.join(str(tmp_path), "bk2")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "best_score.json"), "w") as f:
        json.dump([3.0, 100.0], f)  # old 2-component (laps, reward) score
    t = Trainer(settings, config)
    assert t.best_eval_score == (-float("inf"),) * 3
    t.close()


def test_solve_metric_distance(tmp_path, monkeypatch):
    """freeze_on_solve keyed on eval distance (the route config's 3000 m
    budget) instead of laps."""
    settings = TrainerSettings(
        model_name="sd",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=1,
        eval_envs=2,
        checkpoint_interval=100,
        freeze_on_solve=1,
        solve_metric="distance",
        solve_distance=2995.0,
    )
    config = ppo.PPOConfig(horizon=8, num_envs=4, num_minibatches=2)

    dist = {"v": 3000.0}
    real_eval = Trainer.evaluate

    def fake_evaluate(self):
        m = real_eval(self)
        m["eval/distance_traveled"] = dist["v"]
        m["eval/laps_completed"] = 0.1  # laps bar NOT met - must not matter
        return m

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)
    t = Trainer(settings, config)
    t.train(num_iterations=1)
    assert t._frozen  # distance bar met despite 0.1 laps
    dist["v"] = 100.0
    t.train(num_iterations=2)
    assert not t._frozen
    t.close()


def test_stall_watchdog():
    """Heartbeats keep the watchdog quiet; silence fires the injected exit
    exactly with STALL_EXIT_CODE; stop() disarms."""
    import time

    from carla_ppo_tpu.utils import watchdog as wd

    calls = []
    # Generous margins: the suite runs serially on one CPU core, so beat
    # gaps can stretch well past their nominal sleep under load.
    w = wd.StallWatchdog(
        timeout_s=2.0, check_interval_s=0.05, _exit_fn=calls.append
    )
    for _ in range(8):
        w.beat()
        time.sleep(0.1)
    assert not calls  # beaten faster than the timeout: never fires
    time.sleep(3.0)  # go quiet past the timeout
    assert calls and calls[0] == wd.STALL_EXIT_CODE
    w.stop()
    w._thread.join(timeout=2.0)
    assert not w._thread.is_alive()


def test_heldout_eval_metrics_route(tmp_path):
    """Route configs emit generalization metrics on never-trained worlds:
    eval_heldout/* (same town, disjoint route seed) and eval_unseen_town/*
    (different town) alongside the training-bank eval/* (VERDICT round-3
    item 5: measure whether the route agent memorized its bank)."""
    settings = TrainerSettings(
        model_name="ho",
        models_root=str(tmp_path),
        num_iterations=1,
        eval_interval=1,
        eval_envs=2,
        eval_max_steps=4,
        checkpoint_interval=0,
        heldout_eval=1,
    )
    config = ppo.PPOConfig(
        horizon=4, num_envs=4, num_minibatches=2, env_kind="route"
    )
    t = Trainer(settings, config)
    m = t.evaluate()
    assert "eval/routes_completed" in m or "eval/laps_completed" in m
    assert any(k.startswith("eval_heldout/") for k in m)
    assert any(k.startswith("eval_unseen_town/") for k in m)
    # The held-out banks are genuinely different worlds.
    ho = t._heldout_params["eval_heldout"]
    assert not np.array_equal(
        np.asarray(ho.track.pos), np.asarray(t.env_params.track.pos)
    )
    t.close()


def test_heldout_eval_disabled(tmp_path):
    settings = TrainerSettings(
        model_name="ho0",
        models_root=str(tmp_path),
        num_iterations=1,
        eval_interval=1,
        eval_envs=2,
        eval_max_steps=4,
        checkpoint_interval=0,
        heldout_eval=0,
    )
    config = ppo.PPOConfig(
        horizon=4, num_envs=4, num_minibatches=2, env_kind="route"
    )
    t = Trainer(settings, config)
    m = t.evaluate()
    assert not any(k.startswith("eval_heldout/") for k in m)
    assert not t._heldout_params
    t.close()


def test_reward_overrides_compose_with_explicit_env_params(tmp_path):
    """Overrides replace fields ON the resolved env_params' reward - both
    with an explicit env_params (round-4 advisor finding: they were
    silently dropped) and on the CLI path, where non-overridden fields must
    keep the env's values rather than reset to RewardParams defaults."""
    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams

    base = EnvParams(
        track=track_mod.make_lap_track(seed=0, props=False),
        reward_fn="reward_traffic_add",
    )
    base = base.replace(reward=base.reward.replace(max_distance=jnp.float32(7.7)))
    settings = TrainerSettings(
        model_name="t_ov",
        models_root=str(tmp_path),
        num_iterations=1,
        eval_interval=0,
        reward_min_speed=31.0,
        pass_bonus=30.0,
        blocked_scale=0.25,
        low_speed_threshold=20.0,
    )
    config = ppo.PPOConfig(horizon=4, num_envs=2, num_minibatches=1)
    trainer = Trainer(settings, config, env_params=base)
    rp = trainer.env_params.reward
    assert float(rp.min_speed) == pytest.approx(31.0)
    assert float(rp.pass_bonus) == pytest.approx(30.0)
    assert float(rp.blocked_scale) == pytest.approx(0.25)
    # Settings take km/h (reference convention); the param stores m/s.
    assert float(rp.low_speed_threshold) == pytest.approx(20.0 / 3.6)
    # Non-overridden fields compose: the caller's 7.7 survives.
    assert float(rp.max_distance) == pytest.approx(7.7)
    trainer.close()
