"""BatchNorm folding (models/fold.py): exactness at eval time.

The fold bakes the frozen running statistics into the conv kernels
(reference eval semantics: /root/reference/src/models/Encoder.py:8-35
conv+BN blocks run with model.eval()); outputs must match the unfolded
model bit-for-bit up to float re-association.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.models.fold import fold_batchnorm

RNGS = {"gumbel": jax.random.PRNGKey(3)}


def small_cfg(**model_kw):
    return Config(
        model=ModelConfig(
            model_type="ode-rnn", img_w=64, img_h=32, seq_len=3,
            v_f_len=32, i_f_len=16, ode_hidden_dim=32, rnn_num_layers=1,
            compute_dtype="float32", **model_kw,
        ),
        solver=SolverConfig(max_steps=8, dt0=1e-2),
        data=DataConfig(seq_len=3),
    )


def batch(seed=0, B=2, S=3, H=32, W=64):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((B, S, H, W, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((B, 10 * (S - 1) + 1, 6)), jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1, 1))
    return img, imu, ts


def randomize_stats(variables, seed=1):
    """Give BN non-trivial running stats so the fold actually does work."""
    rng = np.random.default_rng(seed)

    def walk(p, s):
        out_p, out_s = dict(p), dict(s)
        for k, v in p.items():
            if k.startswith("bn") and isinstance(v, dict) and "scale" in v:
                f = v["scale"].shape
                out_p[k] = {
                    "scale": jnp.asarray(0.5 + rng.random(f), jnp.float32),
                    "bias": jnp.asarray(rng.standard_normal(f) * 0.2,
                                        jnp.float32),
                }
                out_s[k] = {
                    "mean": jnp.asarray(rng.standard_normal(f) * 0.3,
                                        jnp.float32),
                    "var": jnp.asarray(0.2 + rng.random(f), jnp.float32),
                }
            elif isinstance(v, dict) and k in s:
                out_p[k], out_s[k] = walk(v, s[k])
        return out_p, out_s

    p, s = walk(variables["params"], variables["batch_stats"])
    return {**variables, "params": p, "batch_stats": s}


class TestFoldBatchnorm:
    def test_eval_outputs_match(self):
        cfg = small_cfg()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        variables = randomize_stats(variables)
        folded = fold_batchnorm(variables)

        img, imu, ts = batch()
        ref, _ = model.apply(variables, img, imu, ts, train=False, rngs=RNGS)
        got, _ = model.apply(folded, img, imu, ts, train=False, rngs=RNGS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_folded_bn_is_identity_plus_shift(self):
        cfg = small_cfg()
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        variables = randomize_stats(variables)
        folded = fold_batchnorm(variables)
        blk = folded["params"]["image_encoder"]["block0"]["bn"]
        st = folded["batch_stats"]["image_encoder"]["block0"]["bn"]
        assert np.allclose(np.asarray(blk["scale"]), 1.0)
        assert np.allclose(np.asarray(st["mean"]), 0.0)
        # var chosen so sqrt(var + eps) == 1 exactly
        assert np.allclose(np.asarray(np.sqrt(st["var"] + 1e-5)), 1.0)

    def test_inertial_bias_conv_pairs_fold(self):
        """InertialEncoder convs carry use_bias=True; the shift must land in
        the identity BN, leaving the conv bias zero."""
        cfg = small_cfg()
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        variables = randomize_stats(variables)
        folded = fold_batchnorm(variables)
        ie = folded["params"]["inertial_encoder"]
        assert np.allclose(np.asarray(ie["conv0"]["bias"]), 0.0)
        assert not np.allclose(
            np.asarray(ie["bn0"]["bias"]),
            np.asarray(variables["params"]["inertial_encoder"]["bn0"]["bias"]),
        )

    def test_structure_preserved(self):
        """The fold must not change the pytree structure — folded variables
        drop straight into model.apply / checkpoints."""
        cfg = small_cfg()
        _, variables = init_model(cfg, jax.random.PRNGKey(0))
        folded = fold_batchnorm(variables)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(folded))

    def test_noop_without_batch_stats(self):
        v = {"params": {"dense": {"kernel": jnp.ones((2, 2))}}}
        assert fold_batchnorm(v) is v or fold_batchnorm(v) == v


class TestFoldIntoBias:
    """Bias-fold + BN-free graph (ModelConfig.skip_bn): the eval path that
    removes the BatchNorm ops entirely instead of leaving an identity
    affine (measured ~16 ms/step of dead elementwise traffic at flagship
    dims, BENCH.md round 3)."""

    def _models(self):
        import dataclasses

        from ode_vio_tpu.models.deepvio import create_model
        from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

        cfg = small_cfg()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        variables = randomize_stats(variables)
        skim = create_model(
            dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, skip_bn=True)
            )
        )
        return model, skim, variables, fold_batchnorm_into_bias(variables)

    def test_matches_value_fold_bitwise(self):
        """Same arithmetic as the value-level fold — the bias add lands at
        the identical point in the graph, so outputs agree bit-for-bit."""
        model, skim, variables, folded = self._models()
        img, imu, ts = batch()
        ref, _ = model.apply(fold_batchnorm(variables), img, imu, ts,
                             train=False, rngs=RNGS)
        got, _ = skim.apply(folded, img, imu, ts, train=False, rngs=RNGS)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_bn_entries_removed(self):
        _, _, variables, folded = self._models()
        leaves = [
            "/".join(str(getattr(p, "key", p)) for p in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(folded)[0]
        ]
        assert not any("/bn" in p or p.endswith("bn") for p in leaves), leaves
        blk = folded["params"]["image_encoder"]["block0"]["conv"]
        assert "bias" in blk  # ConvBlock conv gains the folded shift

    def test_infer_fn_uses_bias_fold(self):
        """make_infer_fn(fold_bn=True) rebuilds the model BN-free and
        matches the unfolded eval output within float re-association."""
        from ode_vio_tpu.training.loop import make_infer_fn

        model, _, variables, _ = self._models()
        img, imu, ts = batch()
        ref, _ = model.apply(variables, img, imu, ts, train=False, rngs=RNGS)
        infer = make_infer_fn(model, variables, fold_bn=True)
        got, _ = infer(img, imu, ts)
        scale = np.max(np.abs(np.asarray(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4 * max(scale, 1.0))
