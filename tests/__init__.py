"""Tests for carla_ppo_tpu."""
