"""pygame HUD overlay for the interactive viewer.

Parity with reference: CarlaEnv/hud.py - server/client FPS, vehicle telemetry,
fading notifications (collision / lane invasion), and the env's `extra_info`
lines (reward, maneuver, lap progress...). Host-side only; never in the
compiled step path.
"""

from __future__ import annotations

import datetime
from typing import List


class FadingText:
    """Bottom-bar notification that fades out (reference: hud.py:176-198)."""

    def __init__(self, font, dim, pos):
        import pygame

        self.font = font
        self.dim = dim
        self.pos = pos
        self.seconds_left = 0.0
        self.surface = pygame.Surface(self.dim)

    def set_text(self, text, color=(255, 255, 255), seconds=2.0):
        import pygame

        text_texture = self.font.render(text, True, color)
        self.surface = pygame.Surface(self.dim)
        self.seconds_left = seconds
        self.surface.fill((0, 0, 0, 0))
        self.surface.blit(text_texture, (10, 11))

    def tick(self, clock):
        delta_seconds = 1e-3 * clock.get_time()
        self.seconds_left = max(0.0, self.seconds_left - delta_seconds)
        self.surface.set_alpha(int(500.0 * self.seconds_left))

    def render(self, display):
        display.blit(self.surface, self.pos)


class HUD:
    """Telemetry overlay (reference: hud.py:36-169)."""

    def __init__(self, width: int, height: int):
        import pygame

        self.dim = (width, height)
        font_name = "courier" if hasattr(pygame.font, "match_font") else None
        mono = pygame.font.match_font("mono") or pygame.font.get_default_font()
        self._font_mono = pygame.font.Font(mono, 14)
        self._font = pygame.font.Font(pygame.font.get_default_font(), 20)
        self._notifications = FadingText(
            self._font, (width, 40), (0, height - 40)
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
        self._notifications.tick(clock)

    def notification(self, text: str, seconds: float = 2.0) -> None:
        self._notifications.set_text(text, seconds=seconds)

    def error(self, text: str) -> None:
        self._notifications.set_text(f"Error: {text}", color=(255, 0, 0))

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

        surface = pygame.Surface((260, self.dim[1]))
        surface.set_alpha(100)
        display.blit(surface, (0, 0))
        v_offset = 4
        for item in info_text:
            if v_offset + 18 > self.dim[1]:
                break
            if item:
                text = self._font_mono.render(item, True, (255, 255, 255))
                display.blit(text, (8, v_offset))
            v_offset += 18
        self._notifications.render(display)
