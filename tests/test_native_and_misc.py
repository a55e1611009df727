"""Native C++ image-prep parity, Step1X tokenizer, anyres, embedding resize,
task head routing."""

import os
import numpy as np
import pytest
from PIL import Image

from gpt_image_edit_tpu.data.image_processing import (
    preprocess_vae_image,
    preprocess_vit_patches,
)
from gpt_image_edit_tpu.data.step1x_tokenizer import (
    Step1XTokenizer,
    protect_literal,
    split_string,
)
from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer
from gpt_image_edit_tpu.utils.anyres import (
    compute_size,
    concat_images_adaptive,
    dynamic_resize,
    pick_ratio,
)
from gpt_image_edit_tpu.utils.embedding_resize import smart_embedding_resize


class TestNativeImagePrep:
    def test_vit_parity(self):
        from gpt_image_edit_tpu.data.native import available, preprocess_vit_patches_native

        if not available():
            pytest.skip("native toolchain unavailable")
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 256, (120, 200, 3), dtype=np.uint8)
        )
        ours, grid = preprocess_vit_patches_native(img, min_pixels=56 * 56, max_pixels=200704)
        ref, grid_r = preprocess_vit_patches(img, min_pixels=56 * 56, max_pixels=200704)
        assert grid == grid_r
        # PIL uses 8-bit fixed point internally; parity within 1 uint8 level
        assert np.abs(ours - ref).max() < 2.0 / 255.0 / 0.26

    def test_vae_parity(self):
        from gpt_image_edit_tpu.data.native import available, preprocess_vae_image_native

        if not available():
            pytest.skip("native toolchain unavailable")
        img = Image.fromarray(
            np.random.default_rng(1).integers(0, 256, (100, 160, 3), dtype=np.uint8)
        )
        ours = preprocess_vae_image_native(img, 64, 64)
        ref = preprocess_vae_image(img, 64, 64)
        assert np.abs(ours - ref).max() < 2.5 / 127.5


class TestStep1X:
    def test_protect_literal(self):
        assert protect_literal('"step1x"', '"') == '"s t e p 1 x"'

    def test_split_string(self):
        out = split_string('write "HELLO" on the sign')
        assert out == 'write "H E L L O" on the sign'

    def test_curly_quotes_normalized(self):
        out = split_string("add “Hi” text")
        assert out == 'add "H i" text'

    def test_tokenizer_wrapper(self):
        tok = Step1XTokenizer(FakeTokenizer())
        ids = tok.encode('write "AB" here')
        plain = FakeTokenizer().encode('write "A B" here')
        assert ids == plain


class TestAnyres:
    def test_pick_ratio(self):
        assert pick_ratio(1024, 1024) == (1, 1)
        rw, rh = pick_ratio(672, 1568)
        assert abs(rw / rh - 1568 / 672) < 0.01

    def test_compute_size_stride(self):
        h, w = compute_size(3, 2, stride=16, anchor_pixels=1024 * 1024)
        assert h % 16 == 0 and w % 16 == 0
        assert abs((h * w) - 1024 * 1024) / (1024 * 1024) < 0.15

    def test_dynamic_resize(self):
        h, w = dynamic_resize(500, 1000, "any_17ratio", anchor_pixels=1024 * 1024)
        assert w > h  # landscape preserved
        assert h % 32 == 0 and w % 32 == 0

    def test_collage(self):
        imgs = [Image.new("RGB", (10, 10)), Image.new("RGB", (20, 10)),
                Image.new("RGB", (10, 20))]
        grid = concat_images_adaptive(imgs)
        assert grid.size == (40, 40)  # 2x2 cells of 20x20


class TestEmbeddingResize:
    def test_mean_init(self):
        import jax.numpy as jnp

        emb = jnp.arange(12.0).reshape(4, 3)
        head = jnp.arange(12.0).reshape(3, 4)
        emb2, head2 = smart_embedding_resize(2, emb, head)
        assert emb2.shape == (6, 3) and head2.shape == (3, 6)
        np.testing.assert_allclose(np.asarray(emb2[4]), np.asarray(emb).mean(0))
        np.testing.assert_allclose(np.asarray(head2[:, 5]), np.asarray(head).mean(1))


class TestTaskHead:
    def test_route(self):
        import jax

        from gpt_image_edit_tpu.serve.task_head import init_task_head, route

        head = init_task_head(jax.random.key(0), in_dim=8, hidden=16)
        hidden = jax.random.normal(jax.random.key(1), (2, 5, 8))
        ids = np.array([[1, 2, 77091, 4, 5], [1, 2, 3, 4, 5]])
        out = route(head, hidden, ids)
        assert out.shape == (2,) and out.dtype == bool


class TestCompileCache:
    def test_enable_compile_cache_sets_config(self, tmp_path):
        import jax

        from gpt_image_edit_tpu.utils.platform import enable_compile_cache

        d = str(tmp_path / "xla_cache")
        enable_compile_cache(d)
        assert jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)

    def test_env_var_dir(self, tmp_path, monkeypatch):
        import jax

        from gpt_image_edit_tpu.utils.platform import enable_compile_cache

        d = str(tmp_path / "env_cache")
        monkeypatch.setenv("GIE_COMPILE_CACHE", d)
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == d
