#!/usr/bin/env python
"""Gradio web UI (ref:app.py, ref:univa/serve/gradio_web_server.py).

Feature parity with the reference app:
- multi-turn CHAT with history-image conditioning: every generated image
  joins the conversation and conditions later edits (ref:app.py:222-330)
- per-step diffusion progress bar (ref:app.py:308-313 callback_on_step_end)
- generate/understand routing with manual override checkboxes (:272-277)
- quantized-load option (int8 / w8a8 — the NF4 analogue, :129-176)
- seed management incl. -1 = fresh random seed per turn
- OCR prompt enhancer and T5-joint toggles (:236-244, :296-302)
- multi-image per turn; N images per prompt collaged adaptively (:324-329)

Requires `gradio` (host-side; not bundled in this image — the CLI covers
headless use)."""

from __future__ import annotations

import argparse
import random

from PIL import Image


def add_plain_text_watermark(img: Image.Image, text: str,
                             margin: int = 50, font_size: int = 30):
    """Bottom-right text watermark (ref:app.py:42-60; the reference ships it
    behind a commented-out call — available here via --watermark)."""
    from PIL import ImageDraw, ImageFont

    if img.mode != "RGB":
        img = img.convert("RGB")
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype("DejaVuSans.ttf", font_size)
    except OSError:
        font = ImageFont.load_default()
    bbox = draw.textbbox((0, 0), text, font=font)
    x = img.width - (bbox[2] - bbox[0]) - margin
    y = img.height - (bbox[3] - bbox[1]) - margin
    draw.text((max(x, 0), max(y, 0)), text, fill=(255, 255, 255), font=font)
    return img


def build_demo(runtime, default_steps=28, default_guidance=3.5, watermark=None):
    import gradio as gr

    runtime.reset_chat()

    def chat_step(
        image1, image2, text, steps, guidance, seed, num_imgs,
        ocr_enhancer, force_gen, force_und, chatbox,
        progress=gr.Progress(),
    ):
        from gpt_image_edit_tpu.utils.anyres import concat_images_adaptive

        new_images = [Image.open(f) if isinstance(f, str) else f
                      for f in (image1, image2) if f is not None]
        force = True if force_gen else (False if force_und else None)
        seed = int(seed)
        if seed == -1:
            seed = random.SystemRandom().randrange(2**31)

        def on_step(step_idx):
            progress((int(step_idx) + 1) / float(steps))

        n = max(1, int(num_imgs))
        img, answer = runtime.chat_turn(
            text, new_images,
            force_generate=force,
            ocr_enhancer=ocr_enhancer,
            steps=int(steps), guidance=float(guidance),
            seed=seed, step_callback=on_step,
            num_images_per_prompt=n,
        )
        outs = img if isinstance(img, list) else ([img] if img is not None else [])
        if watermark:
            outs = [add_plain_text_watermark(o, watermark) for o in outs]
        progress(1.0)
        chatbox = list(chatbox or [])
        chatbox.append((text, answer))
        out_img = concat_images_adaptive(outs) if len(outs) > 1 else (
            outs[0] if outs else None
        )
        return out_img, answer or "", chatbox, seed

    def reset():
        runtime.reset_chat()
        return None, "", [], 0

    with gr.Blocks(title="GPT-Image-Edit (TPU)") as demo:
        gr.Markdown("## GPT-Image-Edit — TPU-native serving\n"
                    "多轮对话 / multi-turn chat: generated images condition later edits")
        with gr.Row():
            with gr.Column():
                image1 = gr.Image(label="input image 1", type="pil")
                image2 = gr.Image(label="input image 2", type="pil")
                prompt = gr.Textbox(label="instruction / question")
                steps = gr.Slider(1, 50, value=default_steps, step=1, label="steps")
                guidance = gr.Slider(0.0, 10.0, value=default_guidance, label="guidance")
                seed = gr.Number(value=-1, label="seed (-1 = random per turn)")
                num_imgs = gr.Slider(1, 4, value=1, step=1, label="images per prompt")
                ocr = gr.Checkbox(label="OCR prompt enhancer")
                force_gen = gr.Checkbox(label="force image generation")
                force_und = gr.Checkbox(label="force text answer")
                go = gr.Button("Send")
                clear = gr.Button("New chat")
            with gr.Column():
                out_img = gr.Image(label="edited image")
                out_txt = gr.Textbox(label="text answer")
                chatbox = gr.Chatbot(label="conversation")
                used_seed = gr.Number(label="seed used", interactive=False)
        go.click(
            chat_step,
            [image1, image2, prompt, steps, guidance, seed, num_imgs,
             ocr, force_gen, force_und, chatbox],
            [out_img, out_txt, chatbox, used_seed],
        )
        clear.click(reset, [], [out_img, out_txt, chatbox, used_seed])
    return demo


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env, enable_compile_cache
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    enable_compile_cache()  # warm restarts: persist XLA executables
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--flux_path", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--quantize", default=None,
                    choices=[None, "int8", "int4", "w8a8", "w8a8-attn", "w8a8-qk8"],
                    help="int8 weight-only / W8A8 int8-MXU serving "
                         "(the reference's NF4 option, ref:app.py:129-176)")
    ap.add_argument("--offload", action="store_true",
                    help="sequential component offload (ref:app.py:37): "
                         "params park in pinned_host, stage into HBM per "
                         "pipeline stage")
    ap.add_argument("--no_joint_with_t5", action="store_true")
    ap.add_argument("--watermark", default=None,
                    help="optional text watermark on generated images")
    args = ap.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use the CLI instead:\n"
            "  python -m gpt_image_edit_tpu.serve.cli --model_path ..."
        )

    from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

    rt = UnivaRuntime(
        args.model_path, args.flux_path, tiny=args.tiny,
        quantize=args.quantize, joint_with_t5=not args.no_joint_with_t5,
        offload=args.offload,
    )
    build_demo(rt, watermark=args.watermark).launch(server_port=args.port)


if __name__ == "__main__":
    main()
