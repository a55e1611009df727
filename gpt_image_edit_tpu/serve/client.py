"""Python client for the gpt_image_edit_tpu HTTP API (stdlib-only).

The server side is serve/api_server.py; this is the matching consumer —
usable as a library (`ApiClient`) or a CLI:

    python -m gpt_image_edit_tpu.serve.client --url http://host:8000 \
        edit "make the sky dramatic" --image in.png --output out.png --stream

Covers every endpoint: /healthz, /v1/stats, /metrics, /v1/edit (plain and
SSE-streaming), /v1/chat. Images travel base64-PNG both ways.
"""

from __future__ import annotations

import base64
import io
import json
import urllib.error
import urllib.request
from typing import Any, Callable, List, Optional


class ApiClientError(RuntimeError):
    """Non-2xx response: carries the HTTP status and server error text."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


def _pil():
    from PIL import Image  # lazy: keep the module importable without PIL

    return Image


def image_to_b64(img) -> str:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def b64_to_image(data: str):
    return _pil().open(io.BytesIO(base64.b64decode(data))).convert("RGB")


class ApiClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8000",
                 timeout: float = 900.0, api_key: Optional[str] = None):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.api_key = api_key

    # ------------------------------------------------------------------
    def _request(self, path: str, payload: Optional[dict] = None,
                 method: Optional[str] = None):
        headers = {}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        if payload is not None:
            headers["Content-Type"] = "application/json"
            req = urllib.request.Request(
                self.base_url + path,
                data=json.dumps(payload).encode(),
                headers=headers,
                method=method,
            )
        else:
            req = urllib.request.Request(
                self.base_url + path, headers=headers, method=method
            )
        try:
            return urllib.request.urlopen(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            try:
                message = json.loads(e.read()).get("error", "")
            except Exception:  # noqa: BLE001 — error body is best-effort
                message = e.reason
            raise ApiClientError(e.code, message) from e

    def _json(self, path: str, payload: Optional[dict] = None) -> dict:
        with self._request(path, payload) as r:
            return json.loads(r.read())

    # ------------------------------------------------------------------
    def healthz(self) -> dict:
        return self._json("/healthz")

    def stats(self) -> dict:
        return self._json("/v1/stats")

    def metrics(self) -> str:
        with self._request("/metrics") as r:
            return r.read().decode()

    # ------------------------------------------------------------------
    def _edit_payload(self, instruction: str, images, kw: dict) -> dict:
        payload: dict = {"instruction": instruction, **kw}
        if images:
            payload["images"] = [image_to_b64(im) for im in images]
        return payload

    def edit(self, instruction: str, images=None, **kw) -> List[Any]:
        """Run one edit; returns the decoded PIL images."""
        payload = self._edit_payload(instruction, images or [], kw)
        body = self._json("/v1/edit", payload)
        return [b64_to_image(x) for x in body["images"]]

    def edit_stream(
        self,
        instruction: str,
        images=None,
        on_step: Optional[Callable[[int, int], None]] = None,
        **kw,
    ) -> List[Any]:
        """Streaming edit: ``on_step(step, total)`` fires per denoise step;
        returns the decoded PIL images when the `result` event arrives."""
        payload = self._edit_payload(instruction, images or [], kw)
        payload["stream"] = True
        with self._request("/v1/edit", payload) as r:
            event, result = None, None
            for raw in r:
                line = raw.decode().rstrip("\n")
                if line.startswith("event: "):
                    event = line[len("event: "):]
                elif line.startswith("data: "):
                    data = json.loads(line[len("data: "):])
                    if event == "step" and on_step is not None:
                        on_step(data["step"], data["total"])
                    elif event == "result":
                        result = data
                    elif event == "error":
                        raise ApiClientError(500, data["error"])
        if result is None:
            raise ApiClientError(500, "stream ended without a result event")
        return [b64_to_image(x) for x in result["images"]]

    def chat(self, message: str, image=None, **kw) -> dict:
        """Routed chat turn: {"type": "image"|"text", ...} (images decoded)."""
        payload: dict = {"message": message, **kw}
        if image is not None:
            payload["image"] = image_to_b64(image)
        body = self._json("/v1/chat", payload)
        if body.get("type") == "image":
            body["images"] = [b64_to_image(x) for x in body["images"]]
        return body

    # ------------------------------------------------------------------
    # multi-turn conversations (server-side history conditioning)
    def create_conversation(self) -> str:
        return self._json("/v1/conversations", {})["conversation_id"]

    def chat_turn(self, conversation_id: str, message: str,
                  images=None, **kw) -> dict:
        payload: dict = {"message": message, **kw}
        if images:
            payload["images"] = [image_to_b64(im) for im in images]
        body = self._json(f"/v1/conversations/{conversation_id}", payload)
        if body.get("type") == "image":
            body["images"] = [b64_to_image(x) for x in body["images"]]
        return body

    def delete_conversation(self, conversation_id: str) -> None:
        self._request(
            f"/v1/conversations/{conversation_id}", method="DELETE"
        ).close()


def main(argv=None) -> int:
    import argparse

    import os

    p = argparse.ArgumentParser(description="gpt_image_edit_tpu API client")
    p.add_argument("--url", type=str, default="http://127.0.0.1:8000")
    p.add_argument("--timeout", type=float, default=900.0)
    p.add_argument("--api_key", type=str,
                   default=os.environ.get("GIE_API_KEY") or None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("edit", help="run one edit")
    pe.add_argument("instruction")
    pe.add_argument("--image", action="append", default=[],
                    help="input image path (repeatable for multi-ref)")
    pe.add_argument("--output", type=str, default="output.png")
    pe.add_argument("--steps", type=int, default=None)
    pe.add_argument("--guidance", type=float, default=None)
    pe.add_argument("--seed", type=int, default=None)
    pe.add_argument("--stream", action="store_true",
                    help="print per-step progress (SSE)")

    pc = sub.add_parser("chat", help="one routed chat turn")
    pc.add_argument("message")
    pc.add_argument("--image", type=str, default=None)
    pc.add_argument("--output", type=str, default="output.png")

    for name in ("healthz", "stats", "metrics"):
        sub.add_parser(name)

    args = p.parse_args(argv)
    client = ApiClient(args.url, timeout=args.timeout, api_key=args.api_key)

    if args.cmd in ("healthz", "stats"):
        print(json.dumps(getattr(client, args.cmd)(), indent=2))
        return 0
    if args.cmd == "metrics":
        print(client.metrics(), end="")
        return 0

    Image = _pil()
    if args.cmd == "chat":
        img = Image.open(args.image) if args.image else None
        out = client.chat(args.message, img)
        if out.get("type") == "image":
            out["images"][0].save(args.output)
            print(f"saved {args.output}")
        else:
            print(out.get("text", ""))
        return 0

    # edit
    kw = {k: getattr(args, k) for k in ("steps", "guidance", "seed")
          if getattr(args, k) is not None}
    images = [Image.open(x) for x in args.image]
    if args.stream:
        outs = client.edit_stream(
            args.instruction, images,
            on_step=lambda i, n: print(f"step {i + 1}/{n}", flush=True),
            **kw,
        )
    else:
        outs = client.edit(args.instruction, images, **kw)
    outs[0].save(args.output)
    print(f"saved {args.output} ({outs[0].width}x{outs[0].height})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
