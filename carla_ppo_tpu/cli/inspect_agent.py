"""Inspect a trained agent's policy over the VAE latent space (CLI).

Parity with reference: inspect_agent.py - sliders perturb the latent vector z
and the driving measurements (steer/throttle/speed); the window shows the VAE
decode of z alongside the greedy action the policy takes for
z ++ measurements. Headless `--dump` sweeps one latent dim and prints the
action response instead.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from carla_ppo_tpu.cli.inspect_vae import decode_image
from carla_ppo_tpu.models import vae_common
from carla_ppo_tpu.models.policy import ActorCritic
from carla_ppo_tpu.training import ppo
from carla_ppo_tpu.utils.checkpoint import Checkpointer


def load_agent(model_name: str, obs_dim: int, models_root: str = "models"):
    model = ActorCritic()
    rng = jax.random.PRNGKey(0)
    ts = ppo.create_train_state(model, ppo.PPOConfig(), obs_dim, rng)
    ckpt = Checkpointer(os.path.join(models_root, model_name, "checkpoints"))
    restored = ckpt.restore_latest(ts)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint for model {model_name}")
    return model, restored.params


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Inspect how a trained policy responds to latent perturbations"
    )
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--vae_model", type=str, required=True)
    parser.add_argument("--dump", action="store_true",
                        help="Print an action-response sweep instead of a UI")
    parser.add_argument("--dump_dim", type=int, default=0)
    params = parser.parse_args(argv)

    vae, vae_vars = vae_common.load_vae(params.vae_model)
    obs_dim = vae.z_dim + 3
    model, agent_params = load_agent(params.model_name, obs_dim)

    @jax.jit
    def act(z, measurements):
        obs = jnp.concatenate([z, measurements])[None]
        mean, std, value = model.apply(agent_params, obs)
        return mean[0], value[0]

    if params.dump:
        meas = jnp.asarray([0.0, 0.5, 5.0])
        print(f"sweep of z[{params.dump_dim}] -> greedy [steer, throttle], value")
        for v in np.linspace(-3, 3, 13):
            z = np.zeros(vae.z_dim, np.float32)
            z[params.dump_dim] = v
            a, val = act(jnp.asarray(z), meas)
            print(
                f"  z={v:+.1f}: steer={float(a[0]):+.3f} "
                f"throttle={float(a[1]):.3f} value={float(val):.2f}"
            )
        return

    import tkinter as tk

    from PIL import Image, ImageTk

    z = np.zeros(vae.z_dim, np.float32)
    meas = np.array([0.0, 0.5, 5.0], np.float32)  # steer, throttle, speed

    root = tk.Tk()
    root.title("Agent inspector")
    img_label = tk.Label(root)
    img_label.grid(row=0, column=0, columnspan=4)
    action_label = tk.Label(root, text="", font=("Courier", 12))
    action_label.grid(row=0, column=4)

    def refresh(*_):
        img = decode_image(vae, vae_vars, z)
        pil = Image.fromarray(img).resize(
            (img.shape[1] * 3, img.shape[0] * 3), Image.NEAREST
        )
        tk_img = ImageTk.PhotoImage(pil)
        img_label.configure(image=tk_img)
        img_label.image = tk_img
        a, val = act(jnp.asarray(z), jnp.asarray(meas))
        action_label.configure(
            text=(
                f"steer    {float(a[0]):+.3f}\n"
                f"throttle {float(a[1]):.3f}\n"
                f"value    {float(val):.2f}"
            )
        )

    n_show = min(vae.z_dim, 24)
    rows = (n_show + 3) // 4
    for d in range(n_show):
        def make_cb(dim):
            def cb(val):
                z[dim] = float(val)
                refresh()
            return cb

        s = tk.Scale(root, from_=-3.0, to=3.0, resolution=0.05,
                     orient=tk.HORIZONTAL, length=150, label=f"z{d}",
                     command=make_cb(d))
        s.grid(row=1 + d % rows, column=d // rows)

    meas_specs = [("steer", -1.0, 1.0), ("throttle", 0.0, 1.0), ("speed", 0.0, 30.0)]
    for i, (name, lo, hi) in enumerate(meas_specs):
        def make_mcb(idx):
            def cb(val):
                meas[idx] = float(val)
                refresh()
            return cb

        s = tk.Scale(root, from_=lo, to=hi, resolution=0.05,
                     orient=tk.HORIZONTAL, length=150, label=name,
                     command=make_mcb(i))
        s.set(float(meas[i]))
        s.grid(row=1 + i, column=4)

    refresh()
    root.mainloop()


if __name__ == "__main__":
    main(sys.argv[1:])
