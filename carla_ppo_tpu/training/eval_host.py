"""Host-side greedy evaluation with video recording.

Parity with reference: run_eval.py:30-73 - greedy (std=0) rollout through the
interactive env with every rendered frame appended to an .avi. Used by the
trainer's periodic eval (train.py:121-132) and by cli/run_eval.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from carla_ppo_tpu.utils.video import VideoRecorder


def run_eval(
    env,
    predict_fn: Callable,
    video_filename: Optional[str] = None,
    max_steps: int = 3000,
) -> float:
    """Run one greedy episode; returns total episode reward.

    `predict_fn(env) -> (action, value)` encapsulates observation encoding +
    the greedy policy (the reference calls model.predict(state, greedy=True),
    run_eval.py:54).
    """
    env.reset(is_training=False)
    rendered = env.render(mode="rgb_array")

    video_recorder = None
    if video_filename is not None and rendered is not None:
        video_recorder = VideoRecorder(
            video_filename, frame_size=rendered.shape,
            fps=getattr(env, "average_fps", 30),
        )
        video_recorder.add_frame(rendered)

    total_reward = 0.0
    for _ in range(max_steps):
        action, value = predict_fn(env)
        obs, reward, done, info = env.step(np.asarray(action))
        if info.get("closed"):
            break
        env.extra_info.append("Eval (greedy)")
        env.extra_info.append("Value:  % 20.2f" % value)
        total_reward += reward
        frame = env.render(mode="rgb_array")
        if video_recorder is not None and frame is not None:
            video_recorder.add_frame(frame)
        if done:
            break

    if video_recorder is not None:
        video_recorder.release()
    return total_reward
