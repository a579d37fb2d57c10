"""VAE tests: shapes match the reference architecture, loss parity with a
numpy re-derivation, and a tiny overfit sanity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.models import vae as vae_mod


@pytest.fixture(scope="module")
def conv_vae():
    return vae_mod.ConvVAE(source_shape=(80, 160, 3), target_shape=(80, 160, 1))


@pytest.fixture(scope="module")
def conv_vars(conv_vae):
    x = jnp.zeros((2, 80, 160, 3))
    return conv_vae.init(
        jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), True
    )


def test_conv_shapes(conv_vae, conv_vars):
    """The decoder must reproduce exactly 80x160xC from the 3x8x256 bottleneck
    (reference asserts this at vae/models.py:265)."""
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 80, 160, 3))
    logits, mean, logstd_sq = conv_vae.apply(
        conv_vars, x, jax.random.PRNGKey(3), True
    )
    assert logits.shape == (4, 80 * 160 * 1)
    assert mean.shape == (4, 64)
    assert logstd_sq.shape == (4, 64)
    assert conv_vae._encoded_conv_shape() == (3, 8, 256)


def test_encode_returns_mean(conv_vae, conv_vars):
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 80, 160, 3))
    z = conv_vae.apply(conv_vars, x, method=conv_vae.encode)
    _, mean, _ = conv_vae.apply(conv_vars, x, jax.random.PRNGKey(0), True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mean), rtol=1e-5)


def test_eval_mode_deterministic(conv_vae, conv_vars):
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 80, 160, 3))
    r1 = conv_vae.apply(conv_vars, x, method=conv_vae.reconstruct)
    r2 = conv_vae.apply(conv_vars, x, method=conv_vae.reconstruct)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert r1.shape == (2, 80, 160, 1)
    assert float(r1.min()) >= 0.0 and float(r1.max()) <= 1.0


def test_generate_from_latent(conv_vae, conv_vars):
    z = jax.random.normal(jax.random.PRNGKey(4), (3, 64))
    img = conv_vae.apply(conv_vars, z, method=conv_vae.generate_from_latent)
    assert img.shape == (3, 80, 160, 1)


def test_mlp_vae_shapes():
    m = vae_mod.MlpVAE(source_shape=(80, 160, 3), z_dim=32)
    x = jnp.zeros((2, 80, 160, 3))
    variables = m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), True)
    logits, mean, _ = m.apply(variables, x, jax.random.PRNGKey(2), True)
    assert logits.shape == (2, 80 * 160 * 3)
    assert mean.shape == (2, 32)


def numpy_vae_loss(logits, targets, mean, logstd_sq, beta, kl_tol, z_dim):
    """Reference reductions (vae/models.py:121-137) with sigmoid-BCE."""
    t = targets.reshape(targets.shape[0], -1)
    bce = np.maximum(logits, 0) - logits * t + np.log1p(np.exp(-np.abs(logits)))
    recon = np.mean(np.sum(bce, axis=1))
    kl = -0.5 * np.sum(1 + logstd_sq - mean**2 - np.exp(logstd_sq), axis=1)
    if kl_tol > 0:
        kl = np.maximum(kl, kl_tol * z_dim)
    return recon + beta * np.mean(kl), recon, np.mean(kl)


@pytest.mark.parametrize("kl_tol", [0.0, 0.5])
@pytest.mark.parametrize("beta", [1.0, 4.0])
def test_loss_parity(beta, kl_tol):
    rng = np.random.default_rng(0)
    B, P, Z = 8, 100, 16
    logits = rng.normal(size=(B, P)).astype(np.float32)
    targets = rng.uniform(size=(B, P)).astype(np.float32)
    mean = rng.normal(size=(B, Z)).astype(np.float32)
    logstd_sq = rng.normal(size=(B, Z)).astype(np.float32)

    loss, metrics = vae_mod.vae_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mean),
        jnp.asarray(logstd_sq), beta, kl_tol, Z,
    )
    want_loss, want_recon, want_kl = numpy_vae_loss(
        logits, targets, mean, logstd_sq, beta, kl_tol, Z
    )
    assert float(loss) == pytest.approx(want_loss, rel=1e-4)
    assert float(metrics["reconstruction_loss"]) == pytest.approx(want_recon, rel=1e-4)
    assert float(metrics["kl_loss"]) == pytest.approx(want_kl, rel=1e-4)


def test_bce_matches_tf_formula():
    """bce_loss must equal the tf.nn.sigmoid_cross_entropy_with_logits formula
    max(x,0) - x*z + log(1+exp(-|x|)) the reference relies on."""
    rng = np.random.default_rng(1)
    x = rng.normal(scale=5, size=100).astype(np.float32)
    z = rng.uniform(size=100).astype(np.float32)
    got = np.asarray(vae_mod.bce_loss(jnp.asarray(z), jnp.asarray(x)))
    want = np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
    # And bce_v2 agrees with bce away from saturation.
    got2 = np.asarray(vae_mod.bce_loss_v2(jnp.asarray(z), jnp.asarray(x)))
    np.testing.assert_allclose(got2, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_mlp_vae_overfits_tiny_dataset():
    """A few Adam steps on 4 images must reduce loss (training plumbing works)."""
    import optax

    m = vae_mod.MlpVAE(source_shape=(8, 16, 1), z_dim=8,
                       encoder_sizes=(64,), decoder_sizes=(64,))
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 16, 1))
    variables = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2), True)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, rng):
        def loss_fn(v):
            logits, mean, logstd_sq = m.apply(v, x, rng, True)
            loss, _ = vae_mod.vae_loss(logits, x, mean, logstd_sq, 1.0, 0.0, 8)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    losses = []
    rng = jax.random.PRNGKey(3)
    for i in range(60):
        rng, k = jax.random.split(rng)
        variables, opt_state, loss = step(variables, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_encode_batch_matches_vmapped_state_fn(lap_params):
    """create_encode_batch_fn (batch renderer path, the production latent
    rollout) must produce the SAME observations as vmapping the per-env
    create_encode_state_fn - it is a dispatch optimization, not a semantic
    change."""
    from carla_ppo_tpu.envs import lap_env
    from carla_ppo_tpu.models import vae_common

    model = vae_mod.ConvVAE(source_shape=(80, 160, 1), target_shape=(80, 160, 1))
    x = jnp.zeros((1, 80, 160, 1))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), True)

    B = 8
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    for _ in range(10):
        states, _ = jax.vmap(lambda s, a: lap_env.step(s, a, lap_params))(
            states, jnp.tile(jnp.array([0.05, 0.8]), (B, 1))
        )

    per_env = vae_common.create_encode_state_fn(model, variables)
    batched = vae_common.create_encode_batch_fn(model, variables)
    a = jax.vmap(per_env, in_axes=(0, None))(states, lap_params)
    b = batched(states, lap_params)
    assert a.shape == b.shape == (B, model.z_dim + 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_encode_batch_banked_matches_vmapped_state_fn():
    """The banked batch encoder (route/lap_bank latent path) must match the
    per-env slice-then-encode path exactly."""
    from carla_ppo_tpu.envs import route_env, route_planner
    from carla_ppo_tpu.models import vae_common

    town = route_planner.make_town(seed=0)
    bank = route_planner.make_route_bank(town, n_routes=4, capacity=1024, seed=0)
    params = route_env.route_env_params(bank)

    model = vae_mod.ConvVAE(source_shape=(80, 160, 1), target_shape=(80, 160, 1))
    x = jnp.zeros((1, 80, 160, 1))
    variables = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), True)

    B = 8
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    states = jax.vmap(lambda k: route_env.reset(params, k))(keys)

    per_env = vae_common.create_encode_state_fn(model, variables)

    def encode_sliced(s, p):
        t = jax.tree.map(lambda x: x[s.route_id], p.track)
        return per_env(s, p.replace(track=t))

    a = jax.vmap(encode_sliced, in_axes=(0, None))(states, params)
    b = vae_common.create_encode_batch_fn(model, variables, banked=True)(
        states, params
    )
    assert a.shape == b.shape == (B, model.z_dim + 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
