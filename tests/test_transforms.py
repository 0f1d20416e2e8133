"""Transform semantics: host geometry vs cv2 golden, device ops vs numpy golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nkbx.transforms as T
from nkbx.transforms.device import rgb_to_hsv, hsv_to_rgb


def _img(h=37, w=53, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), dtype=np.uint8)


class TestHostGeometry:
    def test_longest_max_size(self):
        img = _img(40, 80)
        out = T.Compose([T.LongestMaxSize(32)]).host_apply(img)
        assert out.shape == (16, 32, 3)

    def test_longest_max_size_matches_cv2(self):
        import cv2

        img = _img(64, 48)
        out = T.Compose([T.LongestMaxSize(32)]).host_apply(img)
        ref = cv2.resize(img, (24, 32), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(out, ref)

    def test_pad_if_needed_centered(self):
        img = _img(10, 20)
        out = T.Compose([T.PadIfNeeded(32, 32, value=0)]).host_apply(img)
        assert out.shape == (32, 32, 3)
        # centered: pad_top = (32-10)//2 = 11
        assert (out[:11] == 0).all() and (out[21:]== 0).all()
        np.testing.assert_array_equal(out[11:21, 6:26], img)

    def test_longest_plus_pad_static_shape(self):
        pipe = T.Compose([T.LongestMaxSize(64), T.PadIfNeeded(64, 64)])
        assert pipe.output_size() == (64, 64)
        for h, w in [(100, 30), (30, 100), (64, 64), (5, 7)]:
            assert pipe.host_apply(_img(h, w)).shape == (64, 64, 3)

    def test_resize_center_crop(self):
        pipe = T.Compose([T.Resize(48, 48), T.CenterCrop(32, 32)])
        assert pipe.output_size() == (32, 32)
        assert pipe.host_apply(_img()).shape == (32, 32, 3)


class TestColorSpace:
    def test_hsv_roundtrip(self):
        x = jnp.asarray(_img(16, 16).astype(np.float32))
        h, s, v = rgb_to_hsv(x)
        y = hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)

    def test_hsv_matches_cv2(self):
        import cv2

        img = _img(24, 24, seed=3)
        h, s, v = rgb_to_hsv(jnp.asarray(img.astype(np.float32)))
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
        dh = np.abs(np.asarray(h) - ref[..., 0])
        dh = np.minimum(dh, 180.0 - dh)  # hue is circular mod 180
        assert dh.max() <= 1.0
        np.testing.assert_allclose(np.asarray(s), ref[..., 1], atol=1.0)
        np.testing.assert_allclose(np.asarray(v), ref[..., 2], atol=0.51)


class TestDeviceOps:
    def _batch(self, n=4, hw=32, seed=0):
        return jnp.asarray(
            np.random.default_rng(seed).integers(0, 255, (n, hw, hw, 3), dtype=np.uint8)
        )

    def test_normalize_only(self):
        pipe = T.Compose([T.Normalize(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))])
        batch = self._batch()
        out = pipe.device_apply(batch, jax.random.PRNGKey(0))
        ref = (np.asarray(batch).astype(np.float32) - 127.5) / 127.5
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_hflip_deterministic_p1(self):
        pipe = T.Compose([T.HorizontalFlip(p=1.0), T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        batch = self._batch()
        out = pipe.device_apply(batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch)[:, :, ::-1, :], atol=1e-4)

    def test_vflip_p0_noop(self):
        pipe = T.Compose([T.VerticalFlip(p=0.0), T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        batch = self._batch()
        out = pipe.device_apply(batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch), atol=1e-4)

    def test_eval_mode_skips_random(self):
        pipe = T.Compose([
            T.HorizontalFlip(p=1.0),
            T.CoarseDropout(max_holes=4, max_height=0.5, max_width=0.5, p=1.0),
            T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255)),
        ])
        batch = self._batch()
        out = pipe.device_apply(batch, jax.random.PRNGKey(0), train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch), atol=1e-4)

    def test_brightness_contrast_matches_formula(self):
        t = T.RandomBrightnessContrast(brightness_limit=(0.3, 0.3), contrast_limit=(0.2, 0.2), p=1.0)
        pipe = T.Compose([t, T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        batch = self._batch()
        out = np.asarray(pipe.device_apply(batch, jax.random.PRNGKey(1)))
        ref = np.clip(np.asarray(batch).astype(np.float32) * 1.2 + 0.3 * 255.0, 0, 255)
        np.testing.assert_allclose(out, ref, atol=1e-2)

    def test_coarse_dropout_fills_holes(self):
        t = T.CoarseDropout(max_holes=3, min_holes=3, max_height=0.3, min_height=0.3,
                            max_width=0.3, min_width=0.3, fill_value=0, p=1.0)
        pipe = T.Compose([t, T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        batch = jnp.full((2, 32, 32, 3), 200, dtype=jnp.uint8)
        out = np.asarray(pipe.device_apply(batch, jax.random.PRNGKey(2)))
        n_zero = (out == 0).all(axis=-1).sum(axis=(1, 2))
        hole_area = int(0.3 * 32) ** 2
        assert (n_zero >= hole_area * 0.9).all()  # at least ~1 hole survives overlap
        assert (n_zero <= 3 * hole_area).all()

    def test_hsv_value_shift(self):
        t = T.HueSaturationValue(hue_shift_limit=0, sat_shift_limit=0, val_shift_limit=(50, 50), p=1.0)
        pipe = T.Compose([t, T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        batch = jnp.full((1, 8, 8, 3), 100, dtype=jnp.uint8)
        out = np.asarray(pipe.device_apply(batch, jax.random.PRNGKey(0)))
        # gray pixel: V=100 -> 150, stays gray
        np.testing.assert_allclose(out, 150.0, atol=1.0)

    def test_motion_blur_preserves_mean(self):
        t = T.MotionBlur(blur_limit=7, p=1.0)
        pipe = T.Compose([t, T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        batch = self._batch(2, 32)
        out = np.asarray(pipe.device_apply(batch, jax.random.PRNGKey(5)))
        # blur is an average: interior mean approximately preserved
        ref = np.asarray(batch).astype(np.float32)
        assert abs(out[:, 8:-8, 8:-8].mean() - ref[:, 8:-8, 8:-8].mean()) < 3.0

    def test_full_reference_train_pipeline_compiles(self):
        """The exact singletask_config.py:162-201 pipeline, fused and jitted."""
        pipe = T.Compose([
            T.LongestMaxSize(64),
            T.PadIfNeeded(64, 64, border_mode=0, value=0),
            T.HorizontalFlip(p=0.5),
            T.VerticalFlip(p=0.5),
            T.RandomBrightnessContrast(brightness_limit=(-0.2, 0.2), contrast_limit=(0.1, -0.5), p=0.5),
            T.HueSaturationValue(hue_shift_limit=0, sat_shift_limit=10, val_shift_limit=50, p=0.5),
            T.CoarseDropout(max_holes=4, min_holes=1, max_height=0.2, min_height=0.05,
                            max_width=0.2, min_width=0.05, fill_value=[0, 0.5, 1], p=0.5),
            T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
            T.ToTensorV2(),
        ])
        img = _img(100, 40)
        host_out = pipe.host_apply(img)
        assert host_out.shape == (64, 64, 3) and host_out.dtype == np.uint8
        batch = jnp.asarray(np.stack([host_out] * 8))
        out = pipe.device_apply(batch, jax.random.PRNGKey(0))
        assert out.shape == (8, 64, 64, 3) and out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_single_sample_call_compat(self):
        """Albumentations-style dict call used by save_augs-style debugging."""
        pipe = T.Compose([T.LongestMaxSize(32), T.PadIfNeeded(32, 32),
                          T.Normalize(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))])
        out = pipe(image=_img())
        assert out["image"].shape == (32, 32, 3)


class TestWeatherOps:
    def _gray(self, v=100, n=2, hw=32):
        return jnp.full((n, hw, hw, 3), v, dtype=jnp.uint8)

    def test_fog_whitens(self):
        pipe = T.Compose([T.RandomFog(fog_coef_lower=0.5, fog_coef_upper=0.5, p=1.0),
                          T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        out = np.asarray(pipe.device_apply(self._gray(), jax.random.PRNGKey(0)))
        np.testing.assert_allclose(out, 0.5 * 100 + 0.5 * 255, atol=1.0)

    def test_shadow_darkens_some_pixels(self):
        pipe = T.Compose([T.RandomShadow(num_shadows_lower=1, num_shadows_upper=1, p=1.0),
                          T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        out = np.asarray(pipe.device_apply(self._gray(200), jax.random.PRNGKey(1)))
        darkened = (out < 150).any(axis=-1)
        assert darkened.sum() > 0
        assert (out <= 200.5).all()

    def test_rain_adds_streaks_and_darkens(self):
        pipe = T.Compose([T.RandomRain(p=1.0, brightness_coefficient=0.7),
                          T.Normalize(mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255))])
        out = np.asarray(pipe.device_apply(self._gray(100, hw=48), jax.random.PRNGKey(2)))
        assert abs(np.median(out) - 70) < 3  # darkened background
        assert (out > 150).sum() > 0  # bright streaks exist


class TestReviewFixes:
    def test_crop_pads_small_inputs(self):
        out = T.Compose([T.CenterCrop(64, 64)]).host_apply(_img(40, 100))
        assert out.shape == (64, 64, 3)
        out = T.Compose([T.RandomCrop(64, 64)]).host_apply(_img(40, 30))
        assert out.shape == (64, 64, 3)
        assert T.Compose([T.RandomCrop(64, 64)]).output_size() == (64, 64)

    def test_bare_pad_if_needed_not_static(self):
        assert T.Compose([T.PadIfNeeded(128, 128)]).output_size() is None
        assert T.Compose([T.LongestMaxSize(64), T.PadIfNeeded(128, 128)]).output_size() == (128, 128)
        assert T.Compose([T.SmallestMaxSize(64), T.PadIfNeeded(128, 128)]).output_size() is None

    def test_pad_border_reflect(self):
        img = _img(4, 8)
        out = T.Compose([T.PadIfNeeded(8, 8, border_mode=4)]).host_apply(img)
        assert out.shape == (8, 8, 3)
        np.testing.assert_array_equal(out[2:6, :], img)
        np.testing.assert_array_equal(out[1], img[1])  # reflect101 above

    def test_random_op_after_normalize_rejected(self):
        with pytest.raises(ValueError, match="after Normalize"):
            T.Compose([T.Normalize(), T.HorizontalFlip(p=0.5)])

    def test_motion_blur_validation(self):
        with pytest.raises(ValueError, match="MotionBlur"):
            T.MotionBlur(blur_limit=(4, 4))


class TestConfigSemantics:
    def test_get_explicit_default_wins_over_framework_default(self):
        from nkbx.utils.config import Config

        c = Config({})
        assert c.get("mesh", {"data": 8}) == {"data": 8}
        assert c.get("mesh") is None  # framework default
        assert "mesh" not in c  # presence = user set
        c2 = Config({"mesh": {"data": 2}})
        assert "mesh" in c2 and c2.get("mesh", {"data": 8}) == {"data": 2}

    def test_load_config_same_stem_no_alias(self, tmp_path):
        from nkbx.utils.config import load_config

        (tmp_path / "a").mkdir(); (tmp_path / "b").mkdir()
        (tmp_path / "a" / "config.py").write_text("value = 'A'\n")
        (tmp_path / "b" / "config.py").write_text("value = 'B'\n")
        ca = load_config(tmp_path / "a" / "config.py")
        cb = load_config(tmp_path / "b" / "config.py")
        assert ca.value == "A" and cb.value == "B"


class TestGeometricDeviceOps:
    """Rotate / ShiftScaleRotate vs cv2.warpAffine (what albumentations runs)."""

    @staticmethod
    def _cv2_affine(img, angle, scale, dx, dy, border):
        import cv2

        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
        m[0, 2] += dx * w
        m[1, 2] += dy * h
        mode = cv2.BORDER_REFLECT_101 if border == "reflect101" else cv2.BORDER_CONSTANT
        return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                              borderMode=mode, borderValue=0)

    def test_rotate_matches_cv2(self):
        import jax

        import nkbx.transforms as T

        rng = np.random.default_rng(30)
        img = rng.uniform(0, 255, (2, 20, 20, 3)).astype(np.float32)
        angle = 33.0
        t = T.Rotate(limit=(angle, angle), p=1.0)
        from nkbx.transforms.device import _apply_rotate

        out = np.asarray(_apply_rotate(t, jnp.asarray(img), jax.random.PRNGKey(0)))
        for i in range(2):
            want = self._cv2_affine(img[i], angle, 1.0, 0, 0, "reflect101")
            # interior only: jax 'mirror' and cv2 REFLECT_101 agree, but edge
            # pixels mix interpolation at the boundary
            np.testing.assert_allclose(out[i, 2:-2, 2:-2], want[2:-2, 2:-2],
                                       atol=0.75)

    def test_rotate_90_exact(self):
        import jax

        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_rotate

        rng = np.random.default_rng(31)
        img = rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32)
        t = T.Rotate(limit=(90.0, 90.0), p=1.0)
        out = np.asarray(_apply_rotate(t, jnp.asarray(img), jax.random.PRNGKey(0)))
        # +90 deg (cv2 CCW) on a square grid lands exactly on pixels
        want = self._cv2_affine(img[0], 90.0, 1.0, 0, 0, "reflect101")
        np.testing.assert_allclose(out[0], want, atol=1e-3)

    def test_shift_scale_rotate_matches_cv2(self):
        import jax

        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_shift_scale_rotate

        rng = np.random.default_rng(32)
        img = rng.uniform(0, 255, (1, 24, 24, 3)).astype(np.float32)
        sh, sc, ang = 0.1, 0.2, 15.0
        t = T.ShiftScaleRotate(shift_limit=(sh, sh), scale_limit=(sc, sc),
                               rotate_limit=(ang, ang), p=1.0)
        out = np.asarray(_apply_shift_scale_rotate(
            t, jnp.asarray(img), jax.random.PRNGKey(0)))
        want = self._cv2_affine(img[0], ang, 1.0 + sc, sh, sh, "reflect101")
        np.testing.assert_allclose(out[0, 3:-3, 3:-3], want[3:-3, 3:-3], atol=0.75)

    def test_p_zero_identity_and_pipeline(self):
        import jax

        import nkbx.transforms as T

        pipe = T.Compose([T.Rotate(limit=30, p=0.0),
                          T.ShiftScaleRotate(p=0.0),
                          T.Normalize(mean=(0, 0, 0), std=(1, 1, 1))])
        rng = np.random.default_rng(33)
        img = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        out = np.asarray(pipe.device_apply(jnp.asarray(img), jax.random.PRNGKey(0)))
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-5)


class TestRandAugment:
    """On-device RandAugment: sub-op math vs independent references."""

    def test_equalize_matches_pil(self):
        from PIL import Image, ImageOps

        from nkbx.transforms.device import _ra_equalize

        rng = np.random.default_rng(40)
        # skewed histogram so equalization actually moves values
        img = (rng.beta(2, 5, (2, 24, 24, 3)) * 255).astype(np.uint8)
        out = np.asarray(_ra_equalize(jnp.asarray(img, jnp.float32)))
        for i in range(2):
            want = np.asarray(ImageOps.equalize(Image.fromarray(img[i])))
            np.testing.assert_array_equal(out[i].astype(np.uint8), want)

    def test_posterize_solarize_autocontrast(self):
        from nkbx.transforms.device import (_ra_autocontrast, _ra_posterize,
                                            _ra_solarize)

        rng = np.random.default_rng(41)
        x = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
        xi = jnp.asarray(x)
        post = np.asarray(_ra_posterize(xi, jnp.full((2,), 4.0)))
        np.testing.assert_array_equal(
            post.astype(np.uint8), x.astype(np.uint8) & 0xF0)
        sol = np.asarray(_ra_solarize(xi, jnp.full((2,), 128.0)))
        np.testing.assert_allclose(
            sol, np.where(x >= 128, 255.0 - x, x), atol=1e-5)
        ac = np.asarray(_ra_autocontrast(xi))
        for i in range(2):
            for c in range(3):
                p = x[i, :, :, c]
                want = (p - p.min()) * 255.0 / (p.max() - p.min())
                np.testing.assert_allclose(ac[i, :, :, c], want, atol=1e-3)

    def test_translate_matches_roll(self):
        """Integer translate with constant fill == column shift (both the
        per-sample bilinear path and the shared nearest path)."""
        from nkbx.transforms.device import (_affine_sample,
                                            _shared_nearest_gather)

        rng = np.random.default_rng(42)
        x = rng.uniform(0, 255, (1, 8, 8, 1)).astype(np.float32)
        want = np.zeros_like(x)
        want[:, :, 3:, :] = x[:, :, :-3, :]
        out = np.asarray(_affine_sample(
            jnp.asarray(x), jnp.zeros(1), jnp.ones(1), jnp.full((1,), 3.0),
            jnp.zeros(1), "constant", 0.0))
        np.testing.assert_allclose(out, want, atol=1e-4)
        ys = jnp.arange(8, dtype=jnp.float32)[:, None] * jnp.ones((1, 8))
        xs = jnp.ones((8, 1)) * jnp.arange(8, dtype=jnp.float32)[None, :] - 3.0
        out2 = np.asarray(_shared_nearest_gather(jnp.asarray(x), ys, xs, 0.0))
        np.testing.assert_allclose(out2, want, atol=1e-4)

    def test_magnitude_zero_near_identity(self):
        import jax

        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_randaugment

        rng = np.random.default_rng(43)
        # keep below 255 so the magnitude-0 solarize threshold is inert
        x = jnp.asarray(rng.uniform(0, 250, (8, 12, 12, 3)).astype(np.float32))
        t = T.RandAugment(num_ops=2, magnitude=0)
        out = np.asarray(_apply_randaugment(t, x, jax.random.PRNGKey(1)))
        # affine/color ops are identity at magnitude 0; equalize/autocontrast
        # still act on their drawn samples, so most rows must be unchanged
        # and none should be wildly off unless equalize/autocontrast hit them
        same = [np.allclose(out[i], np.asarray(x)[i], atol=1.0) for i in range(8)]
        assert sum(same) >= 3

    def test_pipeline_integration(self):
        import jax

        import nkbx.transforms as T

        pipe = T.Compose([T.RandAugment(num_ops=2, magnitude=9),
                          T.Normalize(mean=(0.485, 0.456, 0.406),
                                      std=(0.229, 0.224, 0.225))])
        rng = np.random.default_rng(44)
        img = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
        out = np.asarray(pipe.device_apply(jnp.asarray(img), jax.random.PRNGKey(2)))
        assert out.shape == img.shape and np.isfinite(out).all()
        # eval mode skips the policy entirely
        ev = np.asarray(pipe.device_apply(jnp.asarray(img), jax.random.PRNGKey(2),
                                          train=False))
        want = (img.astype(np.float32) - np.array([0.485, 0.456, 0.406]) * 255) / (
            np.array([0.229, 0.224, 0.225]) * 255)
        np.testing.assert_allclose(ev, want, atol=1e-4)

    def test_bad_magnitude_raises(self):
        import nkbx.transforms as T

        with pytest.raises(ValueError, match="magnitude"):
            T.RandAugment(magnitude=31)


class TestPerSampleMagnitudes:
    """Round-3 fidelity upgrade: per-sample pointwise magnitudes and K-grid
    bucketed affine magnitudes (VERDICT r2 item 4)."""

    def test_taw_point_mags_per_sample_distribution(self):
        from nkbx.transforms.device import _taw_point_mags

        pm = _taw_point_mags(jax.random.PRNGKey(0), 4096, 31)
        thr = np.asarray(pm["solar_thr"])
        # per-sample draws: 31 distinct magnitude bins must appear
        assert len(np.unique(np.round(thr, 3))) == 31
        # uniform over bins: mean threshold = 255 * (1 - mean(frac)) = 127.5
        assert abs(thr.mean() - 127.5) < 5.0
        cv = np.asarray(pm["color_v"])
        assert (cv > 0).any() and (cv < 0).any()  # signs are per sample
        pb = np.asarray(pm["post_bits"])
        assert pb.min() >= 2.0 and pb.max() <= 8.0

    def test_ra_point_mags_sign_per_sample(self):
        from nkbx.transforms.device import _apply_randaugment  # noqa: F401
        import nkbx.transforms as T  # noqa: F401
        # drawn inside _apply_randaugment; check via the spec default
        assert T.RandAugment().num_affine_grids == 4

    def test_affine_specs_cover_ops_and_signs(self):
        from nkbx.transforms.device import _ra_affine_specs, _taw_affine_specs

        aops, signs, mags = [], [], []
        for i in range(64):
            spec = _taw_affine_specs(jax.random.PRNGKey(i), 4, 31)
            aops.extend(np.asarray(spec["aop"]).tolist())
            signs.extend(np.sign(np.asarray(spec["rot_deg"])).tolist())
            mags.extend(np.abs(np.asarray(spec["rot_deg"])).tolist())
        assert set(aops) == {1, 2, 3, 4, 5}  # all five affine ops drawn
        assert (np.asarray(signs) > 0).any() and (np.asarray(signs) < 0).any()
        # TAW magnitudes vary across grids (31 bins at 135 deg range)
        assert len(np.unique(np.round(mags, 3))) > 10
        spec = _ra_affine_specs(jax.random.PRNGKey(0), 8, 24, 24, 9 / 30)
        # RandAugment magnitude is fixed: |rot| is 0 or the single value
        rot = np.abs(np.asarray(spec["rot_deg"]))
        assert set(np.round(rot, 4).tolist()) <= {0.0, round(30.0 * 9 / 30, 4)}
        # integer translate
        assert np.all(np.asarray(spec["trans_x"]) == np.round(np.asarray(spec["trans_x"])))

    def test_randaugment_three_rounds_scan(self):
        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_randaugment

        rng = np.random.default_rng(60)
        x = jnp.asarray(rng.uniform(0, 255, (4, 16, 16, 3)).astype(np.float32))
        t = T.RandAugment(num_ops=3, magnitude=9)
        out = np.asarray(_apply_randaugment(t, x, jax.random.PRNGKey(7)))
        assert out.shape == x.shape
        assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 255.0

    def test_taw_output_per_sample_solarize_varies(self):
        """On a constant bright image, samples that draw solarize get
        different per-sample thresholds -> different outputs (the old
        round-shared magnitude produced at most one solarized value)."""
        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_trivialaugment

        x = jnp.full((64, 8, 8, 3), 250.0, jnp.float32)
        t = T.TrivialAugmentWide()
        out = np.asarray(_apply_trivialaugment(t, x, jax.random.PRNGKey(3)))
        vals = np.unique(out.reshape(64, -1)[:, 0])
        # many distinct per-sample outcomes across ops/magnitudes
        assert len(vals) > 6


class TestTrivialAugmentWide:
    def test_runs_and_is_bounded(self):
        import jax

        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_trivialaugment

        rng = np.random.default_rng(50)
        x = jnp.asarray(rng.uniform(0, 255, (6, 16, 16, 3)).astype(np.float32))
        t = T.TrivialAugmentWide()
        outs = [np.asarray(_apply_trivialaugment(t, x, jax.random.PRNGKey(i)))
                for i in range(4)]
        for o in outs:
            assert o.shape == x.shape
            assert o.min() >= 0.0 and o.max() <= 255.0
        # magnitudes vary across rounds -> outputs differ
        assert any(not np.allclose(outs[0], o) for o in outs[1:])

    def test_p_zero_identity(self):
        import jax

        import nkbx.transforms as T
        from nkbx.transforms.device import _apply_trivialaugment

        x = jnp.asarray(np.random.default_rng(51).uniform(
            0, 255, (2, 12, 12, 3)).astype(np.float32))
        out = _apply_trivialaugment(T.TrivialAugmentWide(p=0.0), x,
                                    jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_pipeline_and_validation(self):
        import jax

        import nkbx.transforms as T

        with pytest.raises(ValueError, match="num_magnitude_bins"):
            T.TrivialAugmentWide(num_magnitude_bins=1)
        pipe = T.Compose([T.TrivialAugmentWide(),
                          T.Normalize(mean=(0, 0, 0), std=(1, 1, 1))])
        img = np.random.default_rng(52).integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        out = np.asarray(pipe.device_apply(jnp.asarray(img), jax.random.PRNGKey(3)))
        assert out.shape == img.shape and np.isfinite(out).all()


class TestConfigNearMissWarning:
    def test_near_miss_key_warns(self):
        import warnings

        from nkbx.utils.config import Config

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Config({"model_ema": {"decay": 0.9}, "steps_per_dispach": 2,
                    "img_size": 224, "annotations_path": "x", "n_epochs": 1})
            msgs = [str(x.message) for x in w]
        assert any("model_ema_decay" in m for m in msgs)
        assert any("steps_per_dispatch" in m for m in msgs)
        # helper variables stay silent
        assert not any("img_size" in m or "annotations_path" in m for m in msgs)
