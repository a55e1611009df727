"""Production HTTP serving API (stdlib-only, JSON + base64 images).

The reference exposes its model through a Gradio demo and an
interactive CLI (ref:app.py, ref:univa/serve/cli.py,
ref:univa/serve/gradio_web_server.py) — human front-ends. A deployment
also needs a machine front-end; this module provides one with zero
dependencies beyond the standard library:

  GET  /healthz    liveness + device backend + queue depth
  GET  /v1/stats   scheduler counters (served/failed/rejected, p50/p95)
  GET  /metrics    the same counters in Prometheus text format
  POST /v1/edit    {"instruction": str, "image"|"images": b64, "steps",
                    "guidance", "true_cfg_scale", "negative_prompt",
                    "height", "width", "seed", "num_images_per_prompt"}
                   -> {"request_id", "images": [b64 PNG], "latency_ms"}
                   with "stream": true -> text/event-stream: per-step
                   `step` events then one `result` (or `error`) event
  POST /v1/chat    {"message": str, "image"?: b64} -> routed single turn:
                   {"type": "image", "images": [...]} or
                   {"type": "text", "text": ...}
  POST /v1/conversations          -> {"conversation_id"}   (multi-turn)
  POST /v1/conversations/<id>     {"message", "image"|"images"?, edit kw}
                   -> routed turn; ALL history images (generated ones
                   included) condition later edits (the Gradio behavior)
  DELETE /v1/conversations/<id>   -> drop the session

All device work funnels through serve/scheduler.DeviceScheduler: one
worker thread owns the TPU, the admission queue is bounded (503 on
overflow), queued requests past --queue_timeout_s are dropped (504)
instead of burning device time for a disconnected client, and
same-shape edit requests can be coalesced into one batched device
program (see runtime.edit_batch).
"""

from __future__ import annotations

import base64
import io
import json
import logging
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, List, Optional

from PIL import Image

from gpt_image_edit_tpu.serve.scheduler import (
    BatchItemErrors,
    DeadlineExceededError,
    DeviceScheduler,
    Job,
    QueueFullError,
    SchedulerClosedError,
)

log = logging.getLogger(__name__)

MAX_BODY_BYTES = 64 * 1024 * 1024  # request admission cap (bounded memory)

# edit() kwargs accepted over the wire, with validators
_EDIT_FIELDS = {
    "steps": int,
    "guidance": float,
    "true_cfg_scale": float,
    "negative_prompt": str,
    "height": int,
    "width": int,
    "seed": int,
    "num_images_per_prompt": int,
}

# text-generation kwargs accepted on the chat endpoints (applied only when
# the turn routes to the understanding branch — runtime._TEXT_KW)
_TEXT_FIELDS = {
    "max_new_tokens": int,
    "do_sample": bool,
    "temperature": float,
    "top_k": int,
    "top_p": float,
}


def _parse_text_fields(payload: dict) -> dict:
    out: dict = {}
    for name, cast in _TEXT_FIELDS.items():
        if name in payload and payload[name] is not None:
            val = payload[name]
            if cast is bool:
                if not isinstance(val, bool):
                    # bool("false") is True — reject instead of sampling
                    raise ApiError(400, f"'{name}' must be a boolean")
            else:
                try:
                    val = cast(val)
                except (TypeError, ValueError) as e:
                    raise ApiError(400, f"invalid '{name}': {e}") from e
            out[name] = val
    if not 1 <= out.get("max_new_tokens", 128) <= 4096:
        raise ApiError(400, "'max_new_tokens' must be in [1, 4096]")
    if out.get("temperature", 1.0) <= 0:
        raise ApiError(400, "'temperature' must be > 0")
    if not 0 < out.get("top_p", 1.0) <= 1:
        raise ApiError(400, "'top_p' must be in (0, 1]")
    if out.get("top_k", 0) < 0:
        raise ApiError(400, "'top_k' must be >= 0")
    return out


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _b64_to_image(data: str) -> Image.Image:
    try:
        raw = base64.b64decode(data, validate=True)
        img = Image.open(io.BytesIO(raw))
        img.load()
        return img.convert("RGB")
    except Exception as e:  # noqa: BLE001 — client error surface
        raise ApiError(400, f"invalid image payload: {e}") from e


def _image_to_b64(img: Image.Image) -> str:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _parse_edit_request(payload: dict) -> dict:
    if not isinstance(payload, dict):
        raise ApiError(400, "body must be a JSON object")
    instruction = payload.get("instruction")
    if not isinstance(instruction, str) or not instruction.strip():
        raise ApiError(400, "'instruction' (non-empty string) is required")
    req: dict = {"instruction": instruction}

    images: List[Image.Image] = []
    if "images" in payload and payload["images"] is not None:
        if not isinstance(payload["images"], list):
            raise ApiError(400, "'images' must be a list of base64 strings")
        images = [_b64_to_image(x) for x in payload["images"]]
    elif payload.get("image") is not None:
        images = [_b64_to_image(payload["image"])]
    req["images"] = images

    for name, cast in _EDIT_FIELDS.items():
        if name in payload and payload[name] is not None:
            try:
                req[name] = cast(payload[name])
            except (TypeError, ValueError) as e:
                raise ApiError(400, f"invalid '{name}': {e}") from e
    if req.get("steps", 28) < 1:
        raise ApiError(400, "'steps' must be >= 1")
    if not 1 <= req.get("num_images_per_prompt", 1) <= 8:
        raise ApiError(400, "'num_images_per_prompt' must be in [1, 8]")
    return req


def _edit_kwargs(req: dict) -> dict:
    kw = {k: v for k, v in req.items() if k in _EDIT_FIELDS}
    imgs = req["images"]
    image = imgs if len(imgs) > 1 else (imgs[0] if imgs else None)
    return {"instruction": req["instruction"], "image": image, **kw}


def edit_signature(req: dict) -> Optional[tuple]:
    """Batch-compatibility key for coalescing (see runtime.edit_batch).

    Two requests may share one device program iff every static shape
    agrees: output size, step count, CFG mode, per-ref cond buckets,
    and images-per-prompt. Instruction text does NOT break batching —
    embeddings are padded to a shared bucket inside edit_batch.
    """
    from gpt_image_edit_tpu.pipeline.kontext import pick_kontext_resolution

    imgs = req["images"]
    cond_buckets = tuple(
        pick_kontext_resolution(im.width, im.height) for im in imgs
    )
    true_cfg = float(req.get("true_cfg_scale", 1.0))
    return (
        req.get("height"),
        req.get("width"),
        req.get("steps", 28),
        float(req.get("guidance", 3.5)),
        # exact scale, matching runtime.edit_batch's equality gate (a bool
        # here would coalesce 2.0-vs-3.0 CFG traffic into batches that the
        # runtime then rejects on every group); the negative prompt only
        # matters when the CFG branch actually runs
        true_cfg,
        req.get("negative_prompt") if true_cfg > 1.0 else None,
        cond_buckets,
        req.get("num_images_per_prompt", 1),
    )


# --- streaming progress plumbing -------------------------------------------
# The denoise scan's step_callback is a STATIC jit argument: every distinct
# function object compiles its own program. One module-level callback +
# a current-sink slot keeps streamed requests on a single cached variant
# (exactly two compiled scans total: with/without progress — same shape as
# the reference's Gradio progress path, ref:app.py:308-313). The slot is
# safe un-locked because ONE scheduler worker owns the device: at most one
# job executes (and therefore streams) at a time.
_PROGRESS_SINK: List[Any] = [None]


def _progress_cb(step_idx) -> None:
    sink = _PROGRESS_SINK[0]
    if sink is not None:
        sink.put(("step", int(step_idx)))


class ChatSession:
    """Multi-turn chat state for one /v1/conversations client: exactly the
    three attributes UnivaRuntime.chat_turn keeps (conversation transcript,
    history images, per-image latent cache). Swapped onto the runtime by
    the single worker thread, so concurrent sessions never interleave."""

    def __init__(self):
        self.conversation: List[dict] = []
        self.history_images: List[Any] = []
        self.cond_cache: dict = {}
        self.last_used = time.monotonic()


class RuntimeExecutor:
    """Bridges scheduler Jobs to a UnivaRuntime.

    Edit jobs with a shared signature run through ``runtime.edit_batch``
    when available (one batched scan for the whole group); otherwise —
    and for chat jobs, which carry routing state — jobs run serially
    with per-item error isolation. Jobs carrying a ``progress`` queue
    (streaming clients) get per-step events via the stable module
    callback above. Jobs carrying a ``session`` (multi-turn conversations)
    have that session's state installed on the runtime for the turn.
    """

    def __init__(self, runtime: Any):
        self.runtime = runtime

    def __call__(self, jobs: List[Job]) -> List[Any]:
        kinds = {j.request["kind"] for j in jobs}
        if (
            kinds == {"edit"}
            and len(jobs) > 1
            and hasattr(self.runtime, "edit_batch")
        ):
            reqs = [_edit_kwargs(j.request["body"]) for j in jobs]
            try:
                outs = self.runtime.edit_batch(reqs)
                return [self._edit_response(o) for o in outs]
            except ValueError as e:
                # shape-incompatible despite the signature gate (custom
                # signature fn, duck-typed runtime): degrade to serial
                log.warning("edit_batch rejected batch (%s); running serially", e)
                # a mid-pipeline reject (e.g. lowering failure inside the
                # batched scan) can leave offloaded components staged; the
                # serial retry must start from an empty-HBM baseline or the
                # VLM re-stage OOMs against the resident FLUX weights
                reset = getattr(self.runtime, "reset_staging", None)
                if reset is not None:
                    reset()

        items: List[Any] = []
        for j in jobs:
            try:
                items.append(self._run_one(j.request))
            except BaseException as e:  # noqa: BLE001 — per-item isolation
                items.append(e)
        if any(isinstance(x, BaseException) for x in items):
            raise BatchItemErrors(items)
        return items

    def _run_one(self, request: dict) -> dict:
        kind, body = request["kind"], request["body"]
        if kind == "chat_turn":
            session: ChatSession = request["session"]
            rt = self.runtime
            # install this conversation's state for the turn (single worker
            # thread: no other job can observe the swapped state); snapshot
            # first — chat_turn mutates the transcript BEFORE generating,
            # so a mid-turn failure must roll back or a client retry would
            # duplicate the user message and conditioning images
            snapshot = (
                list(session.conversation),
                list(session.history_images),
                dict(session.cond_cache),
            )
            rt.conversation = session.conversation
            rt.history_images = session.history_images
            rt._cond_cache = session.cond_cache
            try:
                turn_kw = {
                    k: body[k]
                    for k in ("steps", "guidance", "seed",
                              "num_images_per_prompt", *_TEXT_FIELDS)
                    if k in body
                }
                if "force_generate" in body:
                    turn_kw["force_generate"] = body["force_generate"]
                img_out, text = rt.chat_turn(
                    body["instruction"], body["images"] or None, **turn_kw
                )
            except BaseException:
                (session.conversation, session.history_images,
                 session.cond_cache) = snapshot
                raise
            else:
                session.conversation = rt.conversation
                session.history_images = rt.history_images
                session.cond_cache = rt._cond_cache
            finally:
                session.last_used = time.monotonic()
                rt.reset_chat()
            if img_out is not None:
                images = img_out if isinstance(img_out, list) else [img_out]
                return {"type": "image",
                        "images": [_image_to_b64(im) for im in images]}
            return {"type": "text", "text": text}
        if kind == "edit":
            sink = request.get("progress")
            kwargs = _edit_kwargs(body)
            if sink is not None:
                _PROGRESS_SINK[0] = sink
                kwargs["step_callback"] = _progress_cb
            try:
                out = self.runtime.edit(**kwargs)
            finally:
                if sink is not None:
                    # debug.callback delivery is async wrt the fetched
                    # result: flush stragglers BEFORE releasing the sink,
                    # or a late step event could leak into the next
                    # streamed job's SSE stream
                    import jax

                    jax.effects_barrier()
                    _PROGRESS_SINK[0] = None
            return self._edit_response(out)
        if kind == "chat":
            imgs = body["images"]
            image = imgs[0] if imgs else None
            kw = {k: v for k, v in body.items()
                  if k in _EDIT_FIELDS or k in _TEXT_FIELDS}
            img_out, text = self.runtime.chat(body["instruction"], image, **kw)
            if img_out is not None:
                images = img_out if isinstance(img_out, list) else [img_out]
                return {"type": "image",
                        "images": [_image_to_b64(im) for im in images]}
            return {"type": "text", "text": text}
        raise ApiError(400, f"unknown request kind {kind!r}")

    @staticmethod
    def _edit_response(out: Any) -> dict:
        images = out if isinstance(out, list) else [out]
        return {"images": [_image_to_b64(im) for im in images]}


MAX_SESSIONS = 256  # multi-turn conversations kept server-side (LRU evict)


def _make_handler(
    scheduler: DeviceScheduler,
    runtime: Any,
    queue_timeout_s: Optional[float] = None,
    api_key: Optional[str] = None,
    sessions: Optional[dict] = None,
    sessions_lock: Optional[threading.Lock] = None,
):
    if sessions is None:
        sessions = {}
    if sessions_lock is None:
        sessions_lock = threading.Lock()
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        server_version = "gie-tpu"

        def log_message(self, fmt, *args):  # route to logging, not stderr
            log.debug("%s " + fmt, self.address_string(), *args)

        # ---------------- helpers ----------------
        def _discard_body(self) -> None:
            """Drain an unread request body. HTTP/1.1 keep-alive: leftover
            body bytes would be parsed as the NEXT request's request line,
            corrupting the connection (e.g. responding to a create/401
            before reading the payload)."""
            if getattr(self, "_body_read", False):
                return
            self._body_read = True
            length = int(self.headers.get("Content-Length") or 0)
            if length > MAX_BODY_BYTES:
                self.close_connection = True  # don't slurp abusive bodies
                return
            while length > 0:
                chunk = self.rfile.read(min(length, 1 << 20))
                if not chunk:
                    break
                length -= len(chunk)

        def _send_json(self, status: int, obj: dict) -> None:
            self._discard_body()
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> dict:
            length = int(self.headers.get("Content-Length") or 0)
            self._body_read = True
            if length <= 0:
                raise ApiError(400, "missing request body")
            if length > MAX_BODY_BYTES:
                self.close_connection = True  # unread oversized body
                raise ApiError(413, f"body exceeds {MAX_BODY_BYTES} bytes")
            raw = self.rfile.read(length)
            try:
                return json.loads(raw)
            except json.JSONDecodeError as e:
                raise ApiError(400, f"invalid JSON: {e}") from e

        def _authorized(self) -> bool:
            """Bearer-token check for the model endpoints (when --api_key
            is set); /healthz stays open for liveness probes."""
            if api_key is None:
                return True
            import hmac

            # compare as bytes: compare_digest(str, str) raises TypeError
            # on non-ASCII header values (headers are latin-1 decoded)
            got = self.headers.get("Authorization", "").encode("latin-1")
            ok = hmac.compare_digest(
                got, f"Bearer {api_key}".encode("latin-1")
            )
            if not ok:
                self._send_json(401, {"error": "missing or invalid API key"})
            return ok

        # ---------------- routes ----------------
        def do_GET(self):  # noqa: N802 — http.server API
            self._body_read = False  # per-request (handler spans keep-alive)
            if self.path == "/healthz":
                import jax

                # a latched device fault (TPU worker crash / axon client
                # poisoned by RESOURCE_EXHAUSTED) is unrecoverable
                # in-process: answer 503 so the orchestrator's liveness
                # probe restarts this replica
                fault = scheduler.device_fault
                self._send_json(
                    503 if fault else 200,
                    {
                        "status": "device_fault" if fault else "ok",
                        "backend": jax.default_backend(),
                        "queue_depth": scheduler.queue_depth,
                        **({"device_fault": fault} if fault else {}),
                    },
                )
            elif self.path == "/v1/stats":
                if not self._authorized():
                    return
                st = scheduler.stats()
                timings = getattr(runtime, "stage_timings", None)
                if timings is not None:
                    st["stage_timings"] = timings()
                self._send_json(200, st)
            elif self.path == "/metrics":
                st = scheduler.stats()
                # prometheus values must be numeric: export the fault as a
                # 0/1 gauge (the message itself lives in /healthz and /v1/stats)
                st["device_fault"] = int(st.get("device_fault") is not None)
                lines = []
                for key, val in sorted(st.items()):
                    name = f"gie_{key}"
                    kind = "gauge" if key in (
                        "queue_depth", "max_batch", "device_fault",
                        "latency_p50_s", "latency_p95_s",
                    ) else "counter"
                    lines.append(f"# TYPE {name} {kind}")
                    lines.append(f"{name} {val}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send_json(404, {"error": "not found"})

        def _stream_edit(self, body: dict) -> None:
            """Server-sent events: per-step progress, then the result.
            Streamed jobs never coalesce (signature None) — the step
            events belong to exactly one client."""
            import queue as _queue

            sink: "_queue.Queue" = _queue.Queue()
            job = scheduler.submit(
                {"kind": "edit", "body": body, "progress": sink},
                queue_timeout_s=queue_timeout_s,
            )
            total = body.get("steps", 28)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            self.close_connection = True

            def emit(event: str, data: dict) -> None:
                self.wfile.write(
                    f"event: {event}\ndata: {json.dumps(data)}\n\n".encode()
                )
                self.wfile.flush()

            def drain(block: bool) -> None:
                while True:
                    try:
                        _, step = sink.get(timeout=0.25 if block else 0.0)
                    except _queue.Empty:
                        return
                    emit("step", {"step": step, "total": total})

            try:
                while not job.done:
                    drain(block=True)
                drain(block=False)  # events that landed after the last poll
                try:
                    result = dict(job.result(0))
                    result["request_id"] = job.request_id
                    result["latency_ms"] = round(
                        (job.finished_at - job.enqueued_at) * 1e3, 1
                    )
                    emit("result", result)
                except Exception as e:  # noqa: BLE001 — headers already sent
                    emit("error", {"error": f"{type(e).__name__}: {e}"})
            except (BrokenPipeError, ConnectionResetError):
                pass  # client hung up mid-stream (headers already sent,
                # so no JSON error response is possible or needed)

        def do_POST(self):  # noqa: N802 — http.server API
            self._body_read = False  # per-request (handler spans keep-alive)
            if not self._authorized():
                return
            try:
                if self.path == "/v1/edit":
                    payload = self._read_json()
                    stream = payload.pop("stream", False) if isinstance(
                        payload, dict
                    ) else False
                    if not isinstance(stream, bool):
                        # bool("false") is True — reject instead of
                        # silently switching the response format to SSE
                        raise ApiError(400, "'stream' must be a boolean")
                    body = _parse_edit_request(payload)
                    if stream:
                        return self._stream_edit(body)
                    job = scheduler.submit(
                        {"kind": "edit", "body": body},
                        signature=("edit",) + tuple(edit_signature(body) or ()),
                        queue_timeout_s=queue_timeout_s,
                    )
                    result = job.result()
                    result = dict(result)
                    result["request_id"] = job.request_id
                    result["latency_ms"] = round(
                        (job.finished_at - job.enqueued_at) * 1e3, 1
                    )
                    self._send_json(200, result)
                elif self.path == "/v1/chat":
                    payload = self._read_json()
                    if "message" in payload and "instruction" not in payload:
                        payload = dict(payload, instruction=payload["message"])
                    body = _parse_edit_request(payload)
                    body.update(_parse_text_fields(payload))
                    job = scheduler.submit(
                        {"kind": "chat", "body": body},
                        queue_timeout_s=queue_timeout_s,
                    )
                    result = dict(job.result())
                    result["request_id"] = job.request_id
                    self._send_json(200, result)
                elif self.path == "/v1/conversations":
                    with sessions_lock:
                        if len(sessions) >= MAX_SESSIONS:
                            oldest = min(
                                sessions, key=lambda k: sessions[k].last_used
                            )
                            del sessions[oldest]
                        cid = uuid.uuid4().hex[:16]
                        sessions[cid] = ChatSession()
                    self._send_json(200, {"conversation_id": cid})
                elif self.path.startswith("/v1/conversations/"):
                    cid = self.path[len("/v1/conversations/"):]
                    with sessions_lock:
                        session = sessions.get(cid)
                    if session is None:
                        raise ApiError(404, f"unknown conversation {cid!r}")
                    payload = self._read_json()
                    if "message" in payload and "instruction" not in payload:
                        payload = dict(payload, instruction=payload["message"])
                    fg = payload.pop("force_generate", None)
                    if fg is not None and not isinstance(fg, bool):
                        raise ApiError(400, "'force_generate' must be a boolean")
                    unsupported = [
                        k for k in ("height", "width", "true_cfg_scale",
                                    "negative_prompt")
                        if payload.get(k) is not None
                    ]
                    if unsupported:
                        # fail loudly rather than silently ignoring them:
                        # turn size derives from the history, and true-CFG
                        # needs the negative prefill chat_turn doesn't run
                        raise ApiError(
                            400,
                            f"{unsupported} not supported on conversation "
                            "turns (use /v1/edit)",
                        )
                    body = _parse_edit_request(payload)
                    body.update(_parse_text_fields(payload))
                    if fg is not None:
                        body["force_generate"] = fg
                    session.last_used = time.monotonic()  # active: shield
                    # the session from LRU eviction while its turn queues
                    job = scheduler.submit(
                        {"kind": "chat_turn", "body": body, "session": session},
                        queue_timeout_s=queue_timeout_s,
                    )
                    result = dict(job.result())
                    result["conversation_id"] = cid
                    result["request_id"] = job.request_id
                    self._send_json(200, result)
                else:
                    self._send_json(404, {"error": "not found"})
            except ApiError as e:
                self._send_json(e.status, {"error": e.message})
            except QueueFullError as e:
                self._send_json(503, {"error": str(e), "retry_after_s": 5})
            except DeadlineExceededError as e:
                self._send_json(504, {"error": str(e)})
            except SchedulerClosedError:
                self._send_json(503, {"error": "server shutting down"})
            except BrokenPipeError:
                pass  # client went away mid-response
            except Exception as e:  # noqa: BLE001 — last-resort 500
                log.exception("request failed")
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

        def do_DELETE(self):  # noqa: N802 — http.server API
            self._body_read = False  # per-request (handler spans keep-alive)
            if not self._authorized():
                return
            if self.path.startswith("/v1/conversations/"):
                cid = self.path[len("/v1/conversations/"):]
                with sessions_lock:
                    existed = sessions.pop(cid, None)
                if existed is None:
                    self._send_json(404, {"error": f"unknown conversation {cid!r}"})
                else:
                    self._send_json(200, {"deleted": cid})
            else:
                self._send_json(404, {"error": "not found"})

    return Handler


class ApiServer:
    """Owns the HTTP listener + scheduler; context-manager friendly."""

    def __init__(
        self,
        runtime: Any,
        host: str = "127.0.0.1",
        port: int = 8000,
        *,
        max_queue: int = 32,
        max_batch: int = 1,
        coalesce_window_s: float = 0.05,
        queue_timeout_s: Optional[float] = None,
        api_key: Optional[str] = None,
    ):
        self.runtime = runtime
        self.scheduler = DeviceScheduler(
            RuntimeExecutor(runtime),
            max_batch=max_batch,
            max_queue=max_queue,
            coalesce_window_s=coalesce_window_s,
        )
        self.sessions: dict = {}
        self._sessions_lock = threading.Lock()
        self.httpd = ThreadingHTTPServer(
            (host, port),
            _make_handler(self.scheduler, runtime, queue_timeout_s, api_key,
                          self.sessions, self._sessions_lock),
        )
        self.httpd.daemon_threads = True
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> tuple:
        return self.httpd.server_address

    def start(self) -> "ApiServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="api-server", daemon=True
        )
        self._thread.start()
        log.info("serving on http://%s:%d", *self.address[:2])
        return self

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self, *, drain_timeout_s: float = 600.0) -> None:
        """Stop accepting, then wait up to ``drain_timeout_s`` for the
        in-flight job (a production edit or even a first-request compile
        can run many minutes — the default 30s scheduler join would kill
        the worker mid-request on SIGTERM)."""
        self.httpd.shutdown()
        self.httpd.server_close()
        self.scheduler.shutdown(timeout=drain_timeout_s)
        if self._thread is not None:
            self._thread.join(10)

    def __enter__(self) -> "ApiServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.shutdown()


def main(argv=None):
    import argparse

    from gpt_image_edit_tpu.utils.platform import (
        apply_platform_env,
        enable_compile_cache,
    )

    apply_platform_env()
    p = argparse.ArgumentParser(description="gpt_image_edit_tpu HTTP API server")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--flux_path", type=str, default=None)
    p.add_argument("--tiny", action="store_true", help="random tiny weights")
    p.add_argument("--synthetic_full", action="store_true",
                   help="full-SIZE shape-only weights (7B VLM + 12B FLUX + "
                        "VAE + T5/CLIP) for hardware perf rehearsal — no "
                        "checkpoints needed; single 16GB chip needs "
                        "--offload (utils/synthetic.py)")
    p.add_argument("--quantize", type=str, default=None)
    p.add_argument("--quantize_vlm", nargs="?", const="int8", default=None)
    p.add_argument("--quantize_t5", type=str, default=None,
                   choices=("int8", "int4"),
                   help="weight-only quantized T5-XXL trunk — under "
                        "--offload the bf16 T5 is a 9.4GB per-request "
                        "staging chunk; int8 halves it, int4 quarters it")
    p.add_argument("--vae_dtype", type=str, default="bfloat16")
    p.add_argument("--offload", action="store_true")
    p.add_argument("--max_queue", type=int, default=32)
    p.add_argument("--max_batch", type=int, default=1,
                   help=">1 coalesces same-shape edit requests into one "
                        "batched device program")
    p.add_argument("--coalesce_window_ms", type=float, default=50.0)
    p.add_argument("--queue_timeout_s", type=float, default=None,
                   help="drop queued requests that have not STARTED within "
                        "this long (504) — the client has usually gone away")
    p.add_argument("--api_key", type=str,
                   default=os.environ.get("GIE_API_KEY") or None,
                   help="require 'Authorization: Bearer <key>' on the model "
                        "endpoints (default: $GIE_API_KEY; /healthz and "
                        "/metrics stay open for probes/scrapers)")
    p.add_argument("--compile_cache", type=str, default=None)
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip serving: 'auto' or 'dp,fsdp,tp'")
    p.add_argument("--warmup", type=str, default=None, nargs="?",
                   const="1024x1024:28",
                   help="pre-compile the serving program for WxH[:steps] "
                        "(bare flag: 1024x1024:28) BEFORE accepting traffic "
                        "— the first real request at that shape/step count "
                        "then skips the ~6-8 min scan compile (steps is a "
                        "static jit argument, so warm the production count)")
    p.add_argument("--warmup_variants", type=str, default="plain,streamed",
                   help="which jit variants --warmup compiles (plain and/or "
                        "streamed: step_callback is a static argument, so "
                        "SSE-streamed requests are a separate program); "
                        "deployments that never stream can halve warmup "
                        "time with --warmup_variants plain")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    enable_compile_cache(args.compile_cache)

    from gpt_image_edit_tpu.parallel.mesh import mesh_from_arg
    from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

    runtime = UnivaRuntime(
        args.model_path,
        args.flux_path,
        tiny=args.tiny,
        synthetic_full=args.synthetic_full,
        quantize=args.quantize,
        quantize_vlm=args.quantize_vlm or False,
        quantize_t5=args.quantize_t5,
        vae_dtype=args.vae_dtype,
        offload=args.offload,
        mesh=mesh_from_arg(args.mesh),
    )
    # bind BEFORE warmup: a port conflict must fail in milliseconds, not
    # after the 6-8 min compile; connections queue in the TCP backlog
    # until serve_forever starts accepting
    server = ApiServer(
        runtime,
        args.host,
        args.port,
        max_queue=args.max_queue,
        max_batch=args.max_batch,
        coalesce_window_s=args.coalesce_window_ms / 1e3,
        queue_timeout_s=args.queue_timeout_s,
        api_key=args.api_key,
    )

    if args.warmup:
        import time as _time

        try:
            size, _, steps_s = args.warmup.lower().partition(":")
            w, h = (int(x) for x in size.split("x"))
            warm_steps = int(steps_s) if steps_s else 28
        except ValueError:
            raise SystemExit(f"--warmup must be WxH[:steps], got {args.warmup!r}")
        from PIL import Image as _Image

        # both jit variants: step_callback is a static argument, so plain
        # and streamed requests compile different programs — warm each
        # (the persistent compile cache makes the cost one-time)
        wanted = {v.strip() for v in args.warmup_variants.split(",") if v.strip()}
        unknown = wanted - {"plain", "streamed"}
        if unknown:
            raise SystemExit(f"--warmup_variants: unknown {sorted(unknown)}")
        for label, cb in (("plain", None), ("streamed", _progress_cb)):
            if label not in wanted:
                continue
            log.info("warmup (%s): compiling the %dx%d %d-step program...",
                     label, w, h, warm_steps)
            t0 = _time.perf_counter()
            try:
                runtime.edit(
                    "warmup", _Image.new("RGB", (w, h)),
                    steps=warm_steps, height=h, width=w, seed=0,
                    step_callback=cb,
                )
            except Exception:  # noqa: BLE001 — warmup is best-effort
                # a transient remote-compile failure (observed: UNAVAILABLE
                # on the streamed variant ~20 min in, after the plain
                # variant had already warmed) must not kill a server whose
                # other programs compiled fine — the failed variant will
                # compile on first demand instead
                log.exception("warmup (%s) FAILED after %.1fs; serving "
                              "anyway (that variant compiles on demand)",
                              label, _time.perf_counter() - t0)
                continue
            log.info("warmup (%s) done in %.1fs",
                     label, _time.perf_counter() - t0)

    # graceful drain (the serving analogue of training's PreemptionGuard):
    # SIGTERM/SIGINT stops the listener — in-flight requests finish because
    # shutdown() joins the worker before exiting
    import signal

    def _drain(signum, frame):
        log.info("signal %d: draining and shutting down", signum)
        import threading as _t

        _t.Thread(target=server.httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
