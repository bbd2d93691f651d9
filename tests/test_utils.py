"""Utils: checkpoint round-trips, configs, NaN guards, metrics."""

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu import utils
from beer_tpu.vbi import vb_step


def test_checkpoint_roundtrip(rng, tmp_path):
    data = rng.normal(size=(100, 2))
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(data.mean(0)), jnp.asarray(np.cov(data.T)),
        size=3, cov_type="full", key=jax.random.PRNGKey(0),
    )
    gmm = beer_tpu.Mixture.create(nset)
    _, gmm = vb_step(gmm, jnp.asarray(data))
    path = tmp_path / "model.mdl"
    utils.save_model(gmm, path)
    loaded = utils.load_model(path)
    for a, b in zip(jax.tree.leaves(gmm), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # loaded model trains further (static fields survived)
    elbo, _ = jax.jit(vb_step)(loaded, jnp.asarray(data))
    assert np.isfinite(float(elbo))


def test_latest_checkpoint(tmp_path):
    assert utils.latest_checkpoint(tmp_path) is None
    for i in (1, 3, 2):
        (tmp_path / f"epoch{i:04d}.mdl").write_bytes(b"x")
    assert utils.latest_checkpoint(tmp_path).name == "epoch0003.mdl"


def test_yaml_fallback(tmp_path):
    cfg = tmp_path / "c.yml"
    cfg.write_text("n_units: 20\ncov_type: diagonal\ndeltas: true\nlr: 0.5\n")
    out = utils.load_yaml(cfg)
    assert out == {"n_units": 20, "cov_type": "diagonal", "deltas": True,
                   "lr": 0.5}


def test_nan_guard_catches():
    def bad(x):
        return jnp.log(x)  # negative input -> nan

    guarded = jax.jit(utils.nan_guard(bad, "log"))
    err, _ = guarded(jnp.array([-1.0]))
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised
    err, out = guarded(jnp.array([1.0]))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_metrics_logger(tmp_path):
    logger = utils.MetricsLogger(tmp_path, stdout=False)
    logger.log(0, elbo_per_frame=-4.2, frames_per_sec=1e6)
    logger.log(1, elbo_per_frame=-4.0, frames_per_sec=1.1e6)
    logger.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[1])
    assert rec["step"] == 1 and rec["elbo_per_frame"] == -4.0


def test_checkpoint_roundtrip_all_families(rng, tmp_path):
    """Every model family serializes and reloads as a working pytree."""
    import optax
    from beer_tpu.models.phoneloop import PhoneLoop
    from beer_tpu.models.vae import VAE
    from beer_tpu.models.gsm import HierarchicalGSM

    nset = beer_tpu.NormalSet.create(
        jnp.zeros(3), jnp.eye(3), size=6, cov_type="diagonal",
        key=jax.random.PRNGKey(0),
    )
    models = {
        "phoneloop": PhoneLoop.create(2, 3, nset),
        "ppca": beer_tpu.PPCA.create(4, 2),
        "plda": beer_tpu.PLDA.create(4, 2),
        "vae": VAE.create(
            obs_dim=4, latent_dim=2,
            latent_model=beer_tpu.Normal.create(jnp.zeros(2), jnp.eye(2)),
            hidden=(8,),
        ),
        "hgsm": HierarchicalGSM.create(
            3, 2, 4, n_langs=2, unit_lang=[0, 0, 1]
        ),
    }
    for name, model in models.items():
        path = tmp_path / f"{name}.mdl"
        utils.save_model(model, path)
        loaded = utils.load_model(path)
        assert type(loaded) is type(model), name
        for a, b in zip(jax.tree.leaves(model), jax.tree.leaves(loaded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       err_msg=name)
    # a reloaded VAE still runs its hybrid step
    vae = utils.load_model(tmp_path / "vae.mdl")
    from beer_tpu.models.vae import make_vae_train_step

    tx = optax.adam(1e-3)
    opt_state = tx.init(vae.nnet_params)
    step = make_vae_train_step(tx)
    x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    elbo, *_ = step(vae, opt_state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(elbo))


def test_guard_finite_outputs():
    """Output-side guard for dp steps: passes finite trees, raises with
    leaf paths on non-finite ones."""
    check = utils.guard_finite_outputs("dp_step")
    check({"a": jnp.ones(3), "b": (jnp.zeros(2), jnp.int32(1))})  # no raise
    bad = {"a": jnp.ones(3), "b": (jnp.array([1.0, np.nan]), jnp.int32(1))}
    try:
        check(bad)
        raised = False
    except FloatingPointError as e:
        raised = True
        assert "'b'" in str(e)
    assert raised
