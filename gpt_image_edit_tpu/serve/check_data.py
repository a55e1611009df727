"""Dataset inspection tool (ref:univa/serve/check_data.py): decode samples
back to text + image stats to eyeball the token expansion, weight masks, and
dual image views.

  python -m gpt_image_edit_tpu.serve.check_data --data_txt data.txt -n 3
  python -m gpt_image_edit_tpu.serve.check_data --random_data -n 2
  python -m gpt_image_edit_tpu.serve.check_data --random_data --ui   # Gradio

The --ui flag serves the reference's Gradio inspector form (gated on the
host-side gradio package); the CLI covers headless use."""

from __future__ import annotations

import argparse

import numpy as np

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.dataset import EditDataset
from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer, load_tokenizer


def describe(sample, idx: int):
    ids = sample["input_ids"]
    print(f"--- sample {idx} ---")
    print(f"prompt: {sample['prompt'][:200]!r}")
    print(f"tokens: {len(ids)}; image pads: {(ids == C.IMAGE_TOKEN_ID).sum()}; "
          f"gen trigger: {ids[-1] == C.VISION_START_ID}")
    if sample.get("grid_thw") is not None:
        print(f"vit grids: {sample['grid_thw'].tolist()}")
    if sample.get("ref_pixels") is not None:
        r = sample["ref_pixels"]
        print(f"ref view: {r.shape} range [{r.min():.2f}, {r.max():.2f}]")
    t = sample["target_pixels"]
    print(f"target view: {t.shape} range [{t.min():.2f}, {t.max():.2f}]")
    w = sample["weight_tokens"]
    print(f"weight tokens: {w.shape}, mean {w.mean():.3f}, max {w.max():.3f}, "
          f"upweighted frac {(w > 1).mean():.3f}")


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_txt", default="")
    ap.add_argument("--tokenizer", default="fake")
    ap.add_argument("--random_data", action="store_true")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--ui", action="store_true", help="Gradio inspector")
    ap.add_argument("--port", type=int, default=7861)
    args = ap.parse_args()

    ds = EditDataset(
        tokenizer=load_tokenizer(args.tokenizer),
        data_txt=args.data_txt,
        random_data=args.random_data,
        height=args.height,
        width=args.width,
        notry=True,
    )
    if args.ui:
        return serve_ui(ds, port=args.port)
    print(f"dataset: {len(ds)} samples")
    for i in range(min(args.n, len(ds))):
        describe(ds[i], i)


def serve_ui(ds, port: int = 7861):
    """Gradio form of the inspector (ref:check_data.py Gradio tool): pick a
    sample index, see the decoded prompt, views, and the weight-mask heatmap."""
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("--ui needs gradio (host-side); use the CLI form")
    from PIL import Image

    def show(idx):
        s = ds[int(idx) % len(ds)]
        ids = s["input_ids"]
        info = (
            f"tokens: {len(ids)}  image pads: {(ids == C.IMAGE_TOKEN_ID).sum()}  "
            f"gen trigger: {bool(ids[-1] == C.VISION_START_ID)}\n"
            f"prompt: {s['prompt'][:500]}"
        )
        def to_img(a):
            return Image.fromarray(
                ((np.asarray(a) + 1) * 127.5).clip(0, 255).astype(np.uint8)
            )
        refs = s.get("ref_pixels")
        ref_img = to_img(refs[0]) if refs is not None else None
        tgt_img = to_img(s["target_pixels"])
        w = s["weight_tokens"]
        side = int(np.sqrt(w.size))
        wmap = (w.reshape(side, side) / max(float(w.max()), 1e-6) * 255).astype(np.uint8)
        return info, ref_img, tgt_img, Image.fromarray(wmap)

    with gr.Blocks(title="check_data") as demo:
        idx = gr.Number(value=0, label="sample index")
        info = gr.Textbox(label="decoded sample")
        with gr.Row():
            ref = gr.Image(label="reference view")
            tgt = gr.Image(label="target view")
            wm = gr.Image(label="weight mask")
        idx.change(show, [idx], [info, ref, tgt, wm])
    demo.launch(server_port=port)


if __name__ == "__main__":
    main()
