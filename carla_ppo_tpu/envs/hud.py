"""pygame HUD overlay for the interactive viewer.

Behavior parity with reference: CarlaEnv/hud.py - sim/client FPS, vehicle
telemetry, transient notifications (collision / lane invasion), and the env's
`extra_info` lines (reward, maneuver, lap progress...). Host-side only; never
in the compiled step path.

Original implementation: notifications are a time-stamped message *stack*
(newest at the bottom, several visible at once) whose text is re-rendered
each frame with an alpha computed from the message's remaining lifetime -
there is no persistent pre-blitted surface to fade. Layout is derived from
font metrics (line height, text width) instead of fixed pixel offsets.
"""

from __future__ import annotations

import datetime
import time
from typing import List, Tuple


class NotificationStack:
    """Transient bottom-anchored messages with per-message fade-out.

    Each message carries its own absolute expiry; alpha ramps down linearly
    over the final `fade_window` seconds. Up to `max_visible` messages render
    at once, newest closest to the screen bottom.
    """

    def __init__(self, font, screen_size, fade_window=0.8, max_visible=3):
        self.font = font
        self.screen_w, self.screen_h = screen_size
        self.fade_window = fade_window
        self.max_visible = max_visible
        self._messages: List[Tuple[str, Tuple[int, int, int], float]] = []

    def push(self, text, color=(255, 255, 255), seconds=2.0):
        self._messages.append((text, color, time.monotonic() + seconds))

    def prune(self):
        now = time.monotonic()
        self._messages = [m for m in self._messages if m[2] > now]

    def render(self, display):
        self.prune()
        now = time.monotonic()
        line_h = self.font.get_linesize() + 6
        baseline = self.screen_h - line_h - 6
        for text, color, expiry in reversed(self._messages[-self.max_visible:]):
            remaining = expiry - now
            alpha = int(255 * min(1.0, remaining / self.fade_window))
            label = self.font.render(text, True, color)
            label.set_alpha(alpha)
            x = (self.screen_w - label.get_width()) // 2  # centered
            display.blit(label, (x, baseline))
            baseline -= line_h


class HUD:
    """Telemetry overlay (reference behavior: hud.py:36-169)."""

    PANEL_ALPHA = 140
    PANEL_PAD = 6

    def __init__(self, width: int, height: int):
        import pygame

        self.dim = (width, height)
        mono = pygame.font.match_font("mono") or pygame.font.get_default_font()
        self._font_mono = pygame.font.Font(mono, 13)
        self._font_notify = pygame.font.Font(
            pygame.font.get_default_font(), 18
        )
        self._notifications = NotificationStack(
            self._font_notify, (width, height)
        )
        self.frame_count = 0
        self.sim_time = 0.0
        self.client_fps = 0.0
        self.server_fps = 0.0  # "server" = the compiled step program

    def tick(self, env, clock) -> None:
        self.frame_count += 1
        self.sim_time = float(env.state.time) if env.state is not None else 0.0
        self.client_fps = clock.get_fps()
        self.server_fps = env.fps  # synchronous: locked to env fps

    def notification(self, text: str, seconds: float = 2.0) -> None:
        self._notifications.push(text, seconds=seconds)

    def error(self, text: str) -> None:
        self._notifications.push(f"Error: {text}", color=(255, 60, 60))

    def render(self, display, env, extra_info: List[str]) -> None:
        import pygame

        state = env.state
        speed_kmh = 3.6 * float(state.vehicle.speed)
        info_text = [
            f"Server:  {self.server_fps:16.0f} FPS",
            f"Client:  {self.client_fps:16.0f} FPS",
            "",
            f"Sim time: {datetime.timedelta(seconds=int(self.sim_time))}",
            "",
            f"Speed:   {speed_kmh:20.2f} km/h",
            f"Heading: {float(state.vehicle.yaw):20.2f} rad",
            f"Location: ({float(state.vehicle.pos[0]):5.1f}, "
            f"{float(state.vehicle.pos[1]):5.1f})",
            "",
            f"Steer:    {float(state.control[0]):19.2f}",
            f"Throttle: {float(state.control[1]):19.2f}",
            "",
        ] + list(extra_info)

        # Panel sized to its content: width from the widest line, height from
        # the font's line spacing (no fixed pixel table).
        line_h = self._font_mono.get_linesize()
        labels = [
            self._font_mono.render(item, True, (255, 255, 255)) if item else None
            for item in info_text
        ]
        panel_w = (
            max((l.get_width() for l in labels if l is not None), default=120)
            + 2 * self.PANEL_PAD
        )
        panel = pygame.Surface((panel_w, self.dim[1]))
        panel.set_alpha(self.PANEL_ALPHA)
        display.blit(panel, (0, 0))

        y = self.PANEL_PAD
        for label in labels:
            if y + line_h > self.dim[1]:
                break
            if label is not None:
                display.blit(label, (self.PANEL_PAD, y))
            y += line_h
        self._notifications.render(display)
