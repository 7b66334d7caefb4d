"""Image pipeline tests: bucket selection, crop/resize intrinsics bookkeeping,
parity with the reference cropping implementation."""

import numpy as np
import PIL.Image
import pytest

from mapanything_tpu.data.image import (
    RESOLUTION_MAPPINGS,
    camera_matrix_of_crop,
    crop_resize_if_necessary,
    find_closest_aspect_ratio,
    load_images,
    preprocess_inputs,
    rgb,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return PIL.Image.fromarray(
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    )


class TestBuckets:
    def test_all_multiples_of_14(self):
        for w, h in RESOLUTION_MAPPINGS[518].values():
            assert w % 14 == 0 and h % 14 == 0

    def test_closest_ar(self):
        assert find_closest_aspect_ratio(1.0, 518) == (518, 518)
        assert find_closest_aspect_ratio(16 / 9, 518) == (518, 294)
        assert find_closest_aspect_ratio(0.5, 518) == (252, 518)

    def test_512_set(self):
        assert find_closest_aspect_ratio(4 / 3, 512) == (512, 384)


class TestCropResize:
    def test_output_size_and_intrinsics(self):
        im = _img(1000, 750)
        K = np.array([[800.0, 0, 500], [0, 800, 375], [0, 0, 1]], np.float32)
        out, K2 = crop_resize_if_necessary(im, (518, 392), intrinsics=K)
        assert out.size == (518, 392)
        # principal point stays centered for a centered crop
        assert abs(K2[0, 2] - 518 / 2) < 1.0
        assert abs(K2[1, 2] - 392 / 2) < 1.0
        # focal scaled by the covering scale max(518/1000, 392/750)
        scale = max(518 / 1000, 392 / 750)
        assert abs(K2[0, 0] - 800 * scale) < 2.0

    def test_depth_joint_resize(self):
        im = _img(640, 480)
        depth = np.linspace(1, 5, 640 * 480, dtype=np.float32).reshape(480, 640)
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        out, d2, K2 = crop_resize_if_necessary(im, (518, 392), depthmap=depth, intrinsics=K)
        assert out.size == (518, 392)
        assert d2.shape == (392, 518)
        assert d2.min() >= 1 and d2.max() <= 5  # nearest preserves values

    def test_parity_with_reference(self, ref_geometry):
        """Same pixels out as the reference crop_resize_if_necessary."""
        import sys

        sys.path.insert(0, "/root/reference")
        from mapanything.utils.cropping import (
            crop_resize_if_necessary as ref_crop,
        )

        im = _img(800, 600, seed=7)
        K = np.array([[700.0, 0, 400], [0, 700, 300], [0, 0, 1]], np.float32)
        ours, ours_k = crop_resize_if_necessary(im, (518, 392), intrinsics=K.copy())
        ref, ref_k = ref_crop(im, (518, 392), intrinsics=K.copy())
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
        np.testing.assert_allclose(ours_k, ref_k, atol=1e-4)


class TestLoadImages:
    def test_load_images_from_list(self, tmp_path):
        paths = []
        for i, (w, h) in enumerate([(640, 480), (660, 500)]):
            p = tmp_path / f"img{i}.png"
            _img(w, h, seed=i).save(p)
            paths.append(str(p))
        views = load_images(paths)
        assert len(views) == 2
        v = views[0]
        assert v["img"].shape == (1, 392, 518, 3)  # ~4:3 bucket
        assert v["data_norm_type"] == ["dinov2"]
        # normalized: roughly zero-mean
        assert abs(float(v["img"].mean())) < 2.0
        # denormalization roundtrip
        back = rgb(v["img"], "dinov2")
        assert back.min() >= 0 and back.max() <= 1

    def test_preprocess_inputs_multimodal(self):
        im = np.asarray(_img(640, 480))
        depth = np.full((480, 640), 2.0, np.float32)
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        views = preprocess_inputs(
            [{"img": im, "depth_z": depth, "intrinsics": K}]
        )
        v = views[0]
        assert v["img"].shape == (1, 392, 518, 3)
        assert v["depth_z"].shape == (1, 392, 518, 1)
        assert v["intrinsics"].shape == (1, 3, 3)
        np.testing.assert_allclose(v["depth_z"], 2.0)

    def test_feeds_inference_validation(self):
        """load_images output passes the strict inference validation."""
        from mapanything_tpu.utils.inference import (
            preprocess_input_views_for_inference,
            stack_views,
            validate_input_views_for_inference,
        )

        im = np.asarray(_img(640, 480))
        views = preprocess_inputs([{"img": im}, {"img": im}])
        views = validate_input_views_for_inference(views)
        batched = stack_views(preprocess_input_views_for_inference(views))
        assert batched["img"].shape == (1, 2, 392, 518, 3)


class TestBucketCoverage:
    def test_all_518_buckets_produce_patchable_shapes(self):
        """Every bucket is divisible by 14 -> one jit entry per bucket."""
        for (w, h) in RESOLUTION_MAPPINGS[518].values():
            assert w % 14 == 0 and h % 14 == 0

    def test_512_set_flow(self):
        im = _img(1024, 512, seed=3)
        views = preprocess_inputs([{"img": np.asarray(im)}], resolution_set=512)
        assert views[0]["img"].shape == (1, 256, 512, 3)  # 2:1 bucket

    def test_mixed_aspect_ratios_share_one_bucket(self):
        # wildly different ARs still collapse to a single common bucket so
        # the stacked (B, V, ...) batch is one static shape
        ims = [_img(1000, 500, seed=1), _img(500, 1000, seed=2)]
        views = preprocess_inputs([{"img": np.asarray(i)} for i in ims])
        shapes = {v["img"].shape for v in views}
        assert len(shapes) == 1
