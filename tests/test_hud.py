"""HUD overlay: gauges, help panel, notification stack (headless pygame).

Reference behaviors covered: telemetry panel + notifications (hud.py:36-169),
control bar gauges (hud.py:134-147), HelpText toggle overlay (hud.py:204-224).
All host-side; rendered into an offscreen surface via the SDL dummy driver.
"""

import os

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")

from carla_ppo_tpu.envs.hud import HUD, HelpPanel, NotificationStack


class _FakeEnv:
    """Just enough of CarlaLapEnv's surface for HUD.render/tick."""

    class _S:
        class _V:
            speed = 5.0
            yaw = 0.25
            pos = np.array([12.0, -3.0])

        vehicle = _V()
        control = np.array([-0.4, 0.7])
        time = 42.0

    state = _S()
    fps = 30


@pytest.fixture(scope="module")
def display():
    pygame.init()
    pygame.font.init()
    surf = pygame.display.set_mode((320, 240))
    yield surf
    pygame.quit()


def _nonblack_pixels(surface) -> int:
    arr = pygame.surfarray.array3d(surface)
    return int((arr.sum(axis=2) > 0).sum())


def test_render_with_gauges(display):
    display.fill((0, 0, 0))
    hud = HUD(320, 240)
    hud.tick(_FakeEnv(), pygame.time.Clock())
    hud.render(display, _FakeEnv(), extra_info=["Reward: 1.00"])
    # The panel, labels and the two gauge bars all lit pixels.
    assert _nonblack_pixels(display) > 500


def test_gauge_bipolar_direction(display):
    hud = HUD(320, 240)
    line_h = hud._font_mono.get_linesize()

    def fill_columns(value, bipolar):
        display.fill((0, 0, 0))
        hud._draw_gauge(display, "Steer", value, bipolar, 0, line_h)
        arr = pygame.surfarray.array3d(display)
        bar_x = hud.PANEL_PAD + hud._font_mono.size("Throttle -0.00  ")[0]
        band = arr[bar_x : bar_x + hud.GAUGE_W, : line_h + hud.GAUGE_H].sum(
            axis=(1, 2)
        )
        # Interior fill columns: fully bright rows inside the outline.
        return band > band.max() * 0.6

    mid = hud.GAUGE_W // 2
    left = fill_columns(-1.0, True)
    right = fill_columns(1.0, True)
    # Bipolar: negative steers fill left of the midpoint, positive right.
    assert left[: mid - 2].sum() > right[: mid - 2].sum()
    assert right[mid + 2 :].sum() > left[mid + 2 :].sum()
    # Unipolar: fill grows with the value from the left edge.
    small = fill_columns(0.1, False).sum()
    big = fill_columns(0.9, False).sum()
    assert big > small


def test_help_panel_toggle(display):
    display.fill((0, 0, 0))
    font = pygame.font.Font(pygame.font.get_default_font(), 18)
    panel = HelpPanel(font, (320, 240))
    panel.render(display)
    assert _nonblack_pixels(display) == 0  # hidden by default
    panel.toggle()
    panel.render(display)
    assert _nonblack_pixels(display) > 200
    panel.toggle()
    assert not panel.visible


def test_notification_stack_fades():
    pygame.init()
    pygame.font.init()
    font = pygame.font.Font(pygame.font.get_default_font(), 18)
    stack = NotificationStack(font, (320, 240), fade_window=0.5)
    stack.push("hello", seconds=0.01)
    stack.push("world", seconds=60.0)
    import time

    time.sleep(0.05)
    stack.prune()
    assert [m[0] for m in stack._messages] == ["world"]
