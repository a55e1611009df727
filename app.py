#!/usr/bin/env python
"""Gradio web UI (ref:app.py, ref:univa/serve/gradio_web_server.py).

Multi-image prompts collage adaptively (ref:app.py:324-329), the task head
routes generate-vs-understand with manual override checkboxes
(ref:app.py:272-277), seeds are managed per-request. Requires `gradio`
(host-side; not bundled in this image — the CLI covers headless use)."""

from __future__ import annotations

import argparse

from PIL import Image


def build_demo(runtime, default_steps=28, default_guidance=3.5):
    import gradio as gr

    from gpt_image_edit_tpu.utils.anyres import concat_images_adaptive

    def chat_step(images, prompt, steps, guidance, seed, force_gen, force_und):
        pils = [Image.open(f.name) for f in images] if images else []
        if len(pils) > 1:
            pils = [concat_images_adaptive(pils)]
        image = pils[0] if pils else None
        generate = force_gen or (image is not None and not force_und)
        if generate:
            out = runtime.edit(
                prompt, image, steps=int(steps), guidance=float(guidance),
                seed=int(seed),
            )
            return out, ""
        return None, runtime.answer(prompt, image)

    with gr.Blocks(title="GPT-Image-Edit (TPU)") as demo:
        gr.Markdown("## GPT-Image-Edit — TPU-native serving")
        with gr.Row():
            with gr.Column():
                images = gr.File(file_count="multiple", label="input image(s)")
                prompt = gr.Textbox(label="instruction / question")
                steps = gr.Slider(1, 50, value=default_steps, step=1, label="steps")
                guidance = gr.Slider(0.0, 10.0, value=default_guidance, label="guidance")
                seed = gr.Number(value=0, label="seed")
                force_gen = gr.Checkbox(label="force image generation")
                force_und = gr.Checkbox(label="force text answer")
                go = gr.Button("Run")
            with gr.Column():
                out_img = gr.Image(label="edited image")
                out_txt = gr.Textbox(label="text answer")
        go.click(
            chat_step,
            [images, prompt, steps, guidance, seed, force_gen, force_und],
            [out_img, out_txt],
        )
    return demo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--flux_path", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use the CLI instead:\n"
            "  python -m gpt_image_edit_tpu.serve.cli --model_path ..."
        )

    from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

    rt = UnivaRuntime(args.model_path, args.flux_path, tiny=args.tiny)
    build_demo(rt).launch(server_port=args.port)


if __name__ == "__main__":
    main()
