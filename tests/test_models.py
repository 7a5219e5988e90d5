"""Shape/behavior tests for the Flax model zoo and cost volumes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simplerecon_tpu.models.cost_volume import (DotProductCostVolume,
                                                MLPFeatureVolume,
                                                mlp_input_channels)
from simplerecon_tpu.models.decoders import CVEncoder, DepthDecoderPP
from simplerecon_tpu.models.efficientnet import EfficientNetV2Features
from simplerecon_tpu.models.matching_encoder import ResnetMatchingEncoder
from simplerecon_tpu.ops import cost_volume as cv_ops


def identity_cams(b, k, h, w, f=10.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2], K[1, 2] = w / 2, h / 2
    invK = np.linalg.inv(K).astype(np.float32)
    eye = np.eye(4, dtype=np.float32)
    return (np.tile(K, (b, k, 1, 1)), np.tile(invK, (b, 1, 1)),
            np.tile(eye, (b, k, 1, 1)), np.tile(eye, (b, k, 1, 1)))


class TestDepthPlanes:
    def test_log_spacing(self):
        planes = np.asarray(cv_ops.generate_depth_planes(2, 64, 0.25, 5.0))
        assert planes.shape == (2, 64)
        np.testing.assert_allclose(planes[0, 0], 0.25, rtol=1e-6)
        np.testing.assert_allclose(planes[0, -1], 5.0, rtol=1e-6)
        ratios = planes[0, 1:] / planes[0, :-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)


class TestDotProductCostVolume:
    def test_identity_pose_gives_feature_dot(self, rng):
        """With identity extrinsics every plane warps src onto itself, so the
        volume equals k * <cur, src> at every plane (interior pixels)."""
        b, k, h, w, c = 1, 3, 16, 20, 8
        cur = rng.randn(b, h, w, c).astype(np.float32)
        src = np.tile(cur[:, None], (1, k, 1, 1, 1))
        K, invK, E, P = identity_cams(b, k, h, w)
        cv = DotProductCostVolume(num_depth_bins=8)
        out, _ = cv.init_with_output(jax.random.PRNGKey(0), jnp.asarray(cur),
                                     jnp.asarray(src), jnp.asarray(E),
                                     jnp.asarray(P), jnp.asarray(K),
                                     jnp.asarray(invK))
        volume = np.asarray(out[0])
        want = k * (cur ** 2).sum(-1)
        inner = (slice(None), slice(2, -2), slice(2, -2))
        for d in range(8):
            np.testing.assert_allclose(volume[..., d][inner], want[inner],
                                       rtol=1e-3, atol=1e-3)

    def test_argmax_recovers_true_depth(self, rng):
        """Source features warped from the reference at a known plane depth
        must make the cost argmax select that plane."""
        from simplerecon_tpu.ops.sampling import grid_sample
        from simplerecon_tpu.ops import geometry as geo

        b, h, w, c = 1, 24, 32, 8
        num_bins = 16
        planes = np.asarray(cv_ops.generate_depth_planes(b, num_bins,
                                                         0.25, 5.0))
        true_idx = 9
        d_true = planes[0, true_idx]

        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 30.0
        K[0, 2], K[1, 2] = w / 2, h / 2
        invK = np.linalg.inv(K).astype(np.float32)
        # source camera translated slightly along x
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = -0.3  # src_cam_T_cur_cam

        # smooth random reference features
        base = rng.randn(b, h, w, c).astype(np.float32)
        from simplerecon_tpu.ops.image import gaussian_blur
        cur = np.asarray(gaussian_blur(jnp.asarray(base), 5, 2.0))
        cur = cur / np.linalg.norm(cur, axis=-1, keepdims=True)

        # build the source image so that warping it back at d_true yields cur:
        # sample cur at the projection of src pixels at depth of the plane
        # (inverse warp). src(x') = cur(x) where x' = proj(backproj(x, d)).
        # Instead: forward-warp by sampling cur at projections of src grid
        # through the INVERSE transform.
        Einv = np.linalg.inv(E)
        pts = geo.backproject_depth(
            jnp.full((b, h, w), float(d_true)), jnp.asarray(invK[None]))
        # src-frame points of src pixels at depth d_true, mapped to cur frame
        uvz = geo.project_points(pts, jnp.asarray(K[None]),
                                 jnp.asarray(Einv[None]))
        grid = np.asarray(uvz)[..., :2] * np.array([2.0 / w, 2.0 / h]) - 1.0
        src = np.asarray(grid_sample(jnp.asarray(cur), jnp.asarray(grid)))
        src = src.reshape(b, 1, h, w, c)

        cv = DotProductCostVolume(num_depth_bins=num_bins)
        out, _ = cv.init_with_output(
            jax.random.PRNGKey(0), jnp.asarray(cur), jnp.asarray(src),
            jnp.asarray(E[None, None]), jnp.asarray(Einv[None, None]),
            jnp.asarray(K[None, None]), jnp.asarray(invK[None]))
        volume = np.asarray(out[0])
        argmax = volume[0, 6:-6, 6:-6].argmax(-1)
        # majority of interior pixels peak at the true plane
        assert (argmax == true_idx).mean() > 0.85


class TestMLPFeatureVolume:
    def test_input_width_matches_reference(self):
        # hero config: 16 ch, 7 source views -> 202 input channels
        assert mlp_input_channels(16, 7) == 202

    def test_shapes_and_param_tree(self, rng):
        b, k, h, w, c = 1, 3, 12, 16, 8
        cur = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        src = jnp.asarray(rng.randn(b, k, h, w, c).astype(np.float32))
        K, invK, E, P = identity_cams(b, k, h, w)
        fv = MLPFeatureVolume(num_depth_bins=8, matching_dim_size=c,
                              num_source_views=k, plane_chunk=4)
        out, params = fv.init_with_output(
            jax.random.PRNGKey(0), cur, src, jnp.asarray(E), jnp.asarray(P),
            jnp.asarray(K), jnp.asarray(invK), return_mask=True)
        volume, lowest, planes, mask = out
        assert volume.shape == (b, h, w, 8)
        assert lowest.shape == (b, h, w)
        assert mask.shape == (b, h, w)
        kernel = params["params"]["mlp"]["dense0"]["kernel"]
        assert kernel.shape[0] == mlp_input_channels(c, k)

    def test_chunking_is_invariant(self, rng):
        """Plane chunk size must not change the result."""
        b, k, h, w, c = 1, 2, 8, 10, 4
        cur = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        src = jnp.asarray(rng.randn(b, k, h, w, c).astype(np.float32))
        K, invK, E, P = identity_cams(b, k, h, w)
        args = (cur, src, jnp.asarray(E), jnp.asarray(P), jnp.asarray(K),
                jnp.asarray(invK))
        key = jax.random.PRNGKey(1)
        fv1 = MLPFeatureVolume(num_depth_bins=8, matching_dim_size=c,
                               num_source_views=k, plane_chunk=8)
        fv2 = MLPFeatureVolume(num_depth_bins=8, matching_dim_size=c,
                               num_source_views=k, plane_chunk=2)
        params = fv1.init(key, *args)
        v1 = fv1.apply(params, *args)[0]
        v2 = fv2.apply(params, *args)[0]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


class TestEncoders:
    def test_efficientnet_feature_pyramid(self, rng):
        enc = EfficientNetV2Features()
        x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
        feats, _ = enc.init_with_output(jax.random.PRNGKey(0), x)
        assert [f.shape[-1] for f in feats] == [24, 48, 64, 160, 256]
        assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]

    def test_matching_encoder_quarter_res(self, rng):
        enc = ResnetMatchingEncoder(num_ch_out=16)
        x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
        out, _ = enc.init_with_output(jax.random.PRNGKey(0), x)
        assert out.shape == (2, 16, 24, 16)
        # InstanceNorm output: per-sample/channel ~zero mean, unit var
        np.testing.assert_allclose(np.asarray(out).mean((1, 2)), 0.0,
                                   atol=1e-4)

    def test_matching_encoder_groupnorm_stateless(self, rng):
        """norm="group" (the eval-lag ablation) must carry NO running
        stats — train and eval modes compute the identical function."""
        enc = ResnetMatchingEncoder(num_ch_out=8, norm="group")
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" not in variables
        # NB: mutable=True in Flax returns EVERY collection (params too);
        # ask for batch_stats specifically to assert statelessness.
        train_out, mut = enc.apply(variables, x, True,
                                   mutable=["batch_stats"])
        assert "batch_stats" not in mut  # nothing stateful in train mode
        eval_out = enc.apply(variables, x, False)
        np.testing.assert_allclose(np.asarray(train_out),
                                   np.asarray(eval_out), atol=0)
        assert eval_out.shape == (2, 8, 8, 8)

    def test_stem_conv_space_to_depth_exact(self, rng):
        """The space-to-depth form of the 7x7/2 stem conv must equal the
        direct form (same kernel, zero pad 3) — the padded-regrouped
        kernel covers every original tap exactly once."""
        from simplerecon_tpu.models.matching_encoder import _Conv7x7s2
        x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
        variables = None
        for pack in ("slices", "transpose"):
            conv = _Conv7x7s2(12, impl="s2d", pack=pack)
            out, variables = conv.init_with_output(
                jax.random.PRNGKey(0), x)
            kernel = variables["params"]["kernel"]
            assert kernel.shape == (7, 7, 3, 12)  # checkpoint mapping
            direct = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            assert out.shape == direct.shape == (2, 16, 24, 12)
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(direct),
                                       rtol=1e-5, atol=1e-5)
        # odd spatial dims take the direct-form fallback
        conv = _Conv7x7s2(12, impl="s2d")
        xo = jnp.asarray(rng.randn(1, 31, 47, 3).astype(np.float32))
        out_odd = conv.apply(variables, xo)
        assert out_odd.shape == (1, 16, 24, 12)

    def test_max_blur_pool_matches_reference_pair(self, rng):
        """_max_blur_pool (slice max + separable blur) must equal the
        reference composition maxpool(2,2,s1) -> BlurPool(4-tap)/2."""
        import flax.linen as nn_linen

        from simplerecon_tpu.models.matching_encoder import (
            _blur_pool_4tap, _max_blur_pool)
        x = jnp.asarray(rng.randn(3, 34, 26, 5).astype(np.float32))
        ref = _blur_pool_4tap(nn_linen.max_pool(
            x, (2, 2), strides=(1, 1), padding="VALID"))
        fused = _max_blur_pool(x)
        assert fused.shape == ref.shape
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_matching_encoder_batch_invariance(self, rng):
        """The torch reference needed a one-image-at-a-time workaround
        (test.py:16-25); ours must be batch-size invariant at inference."""
        enc = ResnetMatchingEncoder(num_ch_out=8)
        x = rng.randn(4, 32, 32, 3).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        full = np.asarray(enc.apply(params, jnp.asarray(x)))
        single = np.asarray(enc.apply(params, jnp.asarray(x[1:2])))
        np.testing.assert_allclose(full[1:2], single, atol=1e-5)


class TestDecoders:
    def test_cv_encoder_shapes(self, rng):
        num_ch_enc = [48, 64, 160, 256]
        h, w = 32, 48
        cv = jnp.asarray(rng.randn(1, h, w, 64).astype(np.float32))
        img_feats = [jnp.asarray(rng.randn(1, h // 2 ** i, w // 2 ** i,
                                           ch).astype(np.float32))
                     for i, ch in enumerate(num_ch_enc)]
        enc = CVEncoder()
        outs, _ = enc.init_with_output(jax.random.PRNGKey(0), cv, img_feats)
        assert [o.shape[-1] for o in outs] == [64, 128, 256, 384]
        assert [o.shape[1] for o in outs] == [32, 16, 8, 4]

    def test_depth_decoder_scales(self, rng):
        chans = [24, 64, 128, 256, 384]
        h, w = 64, 96
        feats = [jnp.asarray(rng.randn(1, h // 2 ** i, w // 2 ** i,
                                       ch).astype(np.float32))
                 for i, ch in enumerate(chans)]
        dec = DepthDecoderPP()
        outs, _ = dec.init_with_output(jax.random.PRNGKey(0), feats)
        for i in range(4):
            o = outs[f"log_depth_pred_s{i}_b1hw"]
            assert o.shape == (1, h // 2 ** i, w // 2 ** i, 1)
