"""Sampling-based decoding (ops/sampling.py + qwen2p5vl generate).

The reference delegates token choice to HF `model.generate`
(ref:univa/serve/cli.py:258) whose generation_config may enable
temperature/top-k/top-p sampling. warp_logits must match the
transformers logits_process warpers EXACTLY (golden tests below), and
the compiled decode loop must sample reproducibly from an explicit key.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.ops.sampling import select_next_token, warp_logits


@pytest.fixture(scope="module")
def scores():
    return np.random.default_rng(0).normal(size=(3, 50)).astype(np.float32)


def _hf_warp(scores, t, k, p):
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    s = torch.tensor(scores)
    ids = torch.zeros((scores.shape[0], 1), dtype=torch.long)
    if t is not None:
        s = TemperatureLogitsWarper(t)(ids, s)
    if k is not None:
        s = TopKLogitsWarper(k)(ids, s)
    if p is not None:
        s = TopPLogitsWarper(p)(ids, s)
    return s.numpy()


class TestWarpParity:
    @pytest.mark.parametrize(
        "t,k,p",
        [
            (0.7, 8, 0.9),       # all three chained
            (1.3, None, None),   # temperature only
            (None, 5, None),     # top-k only
            (None, None, 0.5),   # top-p only
            (0.5, 3, 0.3),       # aggressive nucleus over top-k survivors
            (2.0, 49, 0.999),    # k ~ vocab, p ~ 1
            (None, 1, None),     # k=1 degenerates to greedy support
            (None, None, 1e-9),  # p -> 0 keeps exactly min_tokens_to_keep=1
        ],
    )
    def test_matches_hf_warpers(self, scores, t, k, p):
        ref = _hf_warp(scores, t, k, p)
        got = np.asarray(
            warp_logits(
                jnp.asarray(scores),
                temperature=t if t is not None else 1.0,
                top_k=k if k is not None else 0,
                top_p=p if p is not None else 1.0,
            )
        )
        np.testing.assert_array_equal(np.isfinite(ref), np.isfinite(got))
        m = np.isfinite(ref)
        np.testing.assert_allclose(ref[m], got[m], atol=1e-5)

    def test_disabled_warpers_are_identity(self, scores):
        got = np.asarray(warp_logits(jnp.asarray(scores)))
        np.testing.assert_allclose(got, scores, atol=1e-6)

    def test_dynamic_scalars_do_not_recompile(self, scores):
        f = jax.jit(lambda s, t, k, p: warp_logits(s, temperature=t, top_k=k, top_p=p))
        s = jnp.asarray(scores)
        f(s, jnp.float32(0.5), jnp.int32(3), jnp.float32(0.9))
        f(s, jnp.float32(1.7), jnp.int32(20), jnp.float32(0.2))
        f(s, jnp.float32(1.0), jnp.int32(0), jnp.float32(1.0))
        assert f._cache_size() == 1


class TestSelectNextToken:
    def test_greedy_is_argmax(self, scores):
        got = np.asarray(select_next_token(jnp.asarray(scores)))
        np.testing.assert_array_equal(got, scores.argmax(-1))

    def test_peaked_sampling_equals_greedy(self, scores):
        got = np.asarray(
            select_next_token(
                jnp.asarray(scores), jax.random.key(1),
                do_sample=True, temperature=1e-4,
            )
        )
        np.testing.assert_array_equal(got, scores.argmax(-1))

    def test_same_key_reproducible(self, scores):
        a = select_next_token(
            jnp.asarray(scores), jax.random.key(7), do_sample=True,
            temperature=1.5, top_k=10, top_p=0.95,
        )
        b = select_next_token(
            jnp.asarray(scores), jax.random.key(7), do_sample=True,
            temperature=1.5, top_k=10, top_p=0.95,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_uniform_two_tokens_both_sampled(self):
        logits = jnp.zeros((1, 2))
        keys = jax.random.split(jax.random.key(0), 64)
        toks = jax.vmap(
            lambda k: select_next_token(logits, k, do_sample=True)[0]
        )(keys)
        seen = set(np.asarray(toks).tolist())
        assert seen == {0, 1}

    def test_top_k_restricts_support(self, scores):
        # with top_k=2 every sample must be one of the two best tokens
        top2 = np.argsort(scores, axis=-1)[:, -2:]
        for i in range(16):
            toks = np.asarray(
                select_next_token(
                    jnp.asarray(scores), jax.random.key(i),
                    do_sample=True, temperature=3.0, top_k=2,
                )
            )
            for b in range(scores.shape[0]):
                assert toks[b] in top2[b]


class TestGenerateSampling:
    """Tiny text-only model: the full while_loop decode under sampling."""

    @pytest.fixture(scope="class")
    def setup(self):
        from gpt_image_edit_tpu.models.qwen2p5vl.config import Qwen2p5VLConfig
        from gpt_image_edit_tpu.models.qwen2p5vl.model import init

        cfg = Qwen2p5VLConfig.tiny()
        params = init(jax.random.key(0), cfg)
        rng = np.random.default_rng(3)
        input_ids = rng.integers(5, 100, size=(1, 7)).astype(np.int32)
        from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index

        pos_ids, deltas = get_rope_index(input_ids, None, np.ones_like(input_ids))
        return cfg, params, input_ids, pos_ids, deltas

    def _gen(self, setup, **kw):
        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate

        cfg, params, input_ids, pos_ids, deltas = setup
        return generate(
            params, cfg,
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos_ids),
            rope_delta=int(deltas[0, 0]),
            max_new_tokens=6,
            eos_token_id=-1,  # never emitted: full-length decode
            **kw,
        )

    def test_peaked_sampling_matches_greedy(self, setup):
        greedy = self._gen(setup)
        sampled = self._gen(
            setup, do_sample=True, temperature=1e-4, rng=jax.random.key(5)
        )
        assert sampled == greedy

    def test_seeded_sampling_reproducible(self, setup):
        a = self._gen(setup, do_sample=True, temperature=2.0, top_p=0.9,
                      rng=jax.random.key(11))
        b = self._gen(setup, do_sample=True, temperature=2.0, top_p=0.9,
                      rng=jax.random.key(11))
        assert a == b and len(a) == 6

    def test_greedy_alias_unchanged(self, setup):
        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate_greedy

        cfg, params, input_ids, pos_ids, deltas = setup
        out = generate_greedy(
            params, cfg,
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos_ids),
            rope_delta=int(deltas[0, 0]),
            max_new_tokens=6,
            eos_token_id=-1,
        )
        assert out == self._gen(setup)
