"""Aux subsystem smoke: distributed no-op init, prodigy state structure,
validation probe generation standalone, loader determinism."""

import jax
import jax.numpy as jnp
import numpy as np


def test_distributed_single_process_noop():
    from gpt_image_edit_tpu.parallel.distributed import initialize

    initialize()  # WORLD_SIZE unset -> must be a safe no-op
    assert jax.process_count() == 1


def test_prodigy_state_is_pytree_checkpointable():
    import optax

    from gpt_image_edit_tpu.training.prodigy import prodigy

    tx = prodigy()
    params = {"a": jnp.ones((4, 4)), "b": {"c": jnp.zeros(3)}}
    state = tx.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    assert all(hasattr(l, "shape") for l in leaves)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    u, state2 = tx.update(g, state, params)
    optax.apply_updates(params, u)
    assert float(state2.d) >= float(state.d)


def test_batch_loader_prefetch_and_stop():
    from gpt_image_edit_tpu.data.collator import Collator
    from gpt_image_edit_tpu.data.dataset import EditDataset
    from gpt_image_edit_tpu.data.loader import BatchLoader
    from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer
    from gpt_image_edit_tpu.models.qwen2p5vl.config import VisionConfig

    ds = EditDataset(
        tokenizer=FakeTokenizer(), random_data=True, height=64, width=64,
        min_pixels=56 * 56, max_pixels=56 * 56,
    )
    loader = BatchLoader(
        ds, Collator(VisionConfig()), batch_size=2, num_workers=2, seed=0
    )
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["input_ids"].shape[0] == 2
    assert b2["target_pixels"].shape == (2, 64, 64, 3)
    loader.stop()


def test_validation_run_standalone(tmp_path):
    import dataclasses

    from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
    from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
    from gpt_image_edit_tpu.training.validation import ValidationProbe, run_validation

    fcfg = dataclasses.replace(FluxConfig.tiny(), joint_attention_dim=32)
    vcfg = VaeConfig.tiny()
    train = {"flux": init_flux(jax.random.key(0), fcfg)}
    state = {"train": train}
    frozen = jax.tree_util.tree_map(lambda x: None, train)

    def encode_fn(params, prompt, image):
        return (
            jnp.zeros((1, 4, fcfg.joint_attention_dim)),
            jnp.zeros((1, fcfg.pooled_projection_dim)),
        )

    paths = run_validation(
        state=state, frozen=frozen,
        vae_params=init_vae(jax.random.key(1), vcfg),
        qwen_cfg=None, flux_cfg=fcfg, vae_cfg=vcfg,
        encode_prompt_fn=encode_fn,
        probes=[ValidationProbe(name="p0", prompt="test")],
        output_dir=str(tmp_path), step=7, height=32, width=32, num_steps=2,
    )
    assert len(paths) == 1
    import os

    assert os.path.exists(paths[0]) and "step_7" in paths[0]


class TestLvlmConfigStub:
    """Schema parity with ref:univa/training/configuration_lvlm.py (the
    LVLM-pretrain extension point; loader-level test)."""

    def test_from_dict_roundtrip(self):
        from gpt_image_edit_tpu.training.config_lvlm import (
            UnivaLvlmTrainingConfig,
        )

        cfg = UnivaLvlmTrainingConfig.from_dict(
            {"output_dir": "o", "learning_rate": 2e-5, "warmup_steps": 10},
            {"data_txt": "d.txt"},
            {"pretrained_model_path_or_name": "m", "image_processor_path": "p",
             "train_llm": False},
        )
        assert cfg.training_config.learning_rate == 2e-5
        assert cfg.training_config.extra == {"warmup_steps": 10}
        assert cfg.dataset_config.data_txt == "d.txt"
        assert cfg.model_config.train_llm is False
        assert cfg.model_config.train_lm_head is True


def test_batch_loader_seed_changes_order():
    """No-replay resume: the trainer reseeds the shuffle stream with
    seed+start_step, so resumed training must draw a different epoch
    permutation than the fresh run (the reference replays the epoch head,
    ref:train_denoiser.py:768-770 — no sampler state, no skip_first_batches)."""

    class IndexDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            import numpy as np
            return {"target_pixels": np.full((4, 4, 3), i, np.float32), "idx": i}

    from gpt_image_edit_tpu.data.loader import BatchLoader

    def first_ids(seed):
        loader = BatchLoader(
            IndexDataset(), lambda samples: [s["idx"] for s in samples],
            batch_size=8, num_workers=2, seed=seed,
        )
        it = iter(loader)
        out = next(it) + next(it)
        loader.stop()
        return out

    assert first_ids(0) == first_ids(0)          # deterministic
    assert first_ids(0) != first_ids(3)          # reseed -> new permutation


def test_preemption_guard_signal():
    """First SIGTERM only sets the flag (the step in flight survives)."""
    import signal

    from gpt_image_edit_tpu.training.preemption import PreemptionGuard

    with PreemptionGuard() as g:
        assert not g.triggered
        signal.raise_signal(signal.SIGTERM)
        assert g.triggered
    # handler restored on exit
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL or callable(
        signal.getsignal(signal.SIGTERM)
    )
