"""HTTP serving front-end — standard library only, no extra dependencies.

POST /generate with a JSON body:

    {"prompt": "COVID-19 is", "n_predict": 64,
     "temp": 0.7, "top_k": 40, "top_p": 0.9}       # sampling keys optional
    {"prompt_ids": [2, 431, ...], "n_predict": 8}  # pre-tokenized variant

responds ``{"ids": [...], "new_ids": [...], "text": ...}`` (``text`` only
when the server has a tokenizer). GET /healthz returns 200 once the engine
is warm. Requests from concurrent clients batch together on the chip
through :class:`~biogpt_tpu.runtime.serving.ServingScheduler` — submissions
that arrive while a batch is decoding join it at the next free slot.

The reference has no serving surface at all (one prompt per process run,
``/root/reference/main.cpp``); this is north-star scope.

Usage: python -m biogpt_tpu.server -m models/ggml-q4_0.bin --port 8080
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .config import GenerationParams
from .runtime.serving import BatchedEngine, ServingScheduler


class BioGptServer:
    """Bind a ServingScheduler (+ optional tokenizer) to an HTTP port."""

    def __init__(self, scheduler: ServingScheduler, tokenizer=None,
                 host: str = "127.0.0.1", port: int = 0,
                 request_timeout_s: float = 600.0):
        self.scheduler = scheduler
        self.tokenizer = tokenizer
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):   # route through our logger
                from .utils.logging import get_logger
                get_logger("server").debug(fmt, *args)

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"ok": True})
                elif self.path == "/stats":
                    # live serving counters (runtime/metrics.ServingMetrics)
                    self._json(200, outer.scheduler.stats())
                else:
                    self._json(404, {"error": "not found"})

            def _stream(self, ids, sampling):
                """Server-sent events: one `data:` line per generated token
                (tokens arrive in bursts as serving drains land), then a
                final done event with the full result."""
                import queue as _q

                q: "_q.Queue" = _q.Queue()
                fut = outer.scheduler.submit(ids, on_token=q.put, **sampling)
                fut.add_done_callback(lambda f: q.put(None))

                def abort():
                    # a gone client must not keep burning a batch slot
                    if hasattr(outer.scheduler, "abort"):
                        outer.scheduler.abort(fut.request_id)
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()
                # once the 200/event-stream headers are out, every failure
                # must end INSIDE the stream (an error event if the socket
                # still works, silence if it doesn't) — a second HTTP status
                # line on a half-written response is protocol garbage
                try:
                    while True:
                        try:
                            tid = q.get(timeout=request_timeout_s)
                        except _q.Empty:
                            abort()
                            self.wfile.write(
                                b'data: {"error": "timeout"}\n\n')
                            return
                        if tid is None:
                            break
                        ev = {"token_id": tid}
                        if outer.tokenizer is not None:
                            ev["piece"] = outer.tokenizer.id_to_token.get(
                                tid, "<unk>")
                        self.wfile.write(
                            f"data: {json.dumps(ev)}\n\n".encode())
                        self.wfile.flush()
                    result = fut.result()
                    done = {"done": True, "ids": result.ids,
                            "new_ids": result.new_ids}
                    if outer.tokenizer is not None:
                        done["text"] = outer.tokenizer.decode(result.ids)
                    self.wfile.write(f"data: {json.dumps(done)}\n\n".encode())
                except OSError:
                    abort()   # client went away mid-stream
                except Exception as e:
                    try:
                        self.wfile.write(
                            f"data: {json.dumps({'error': str(e)})}\n\n"
                            .encode())
                    except OSError:
                        pass

            def do_POST(self):
                if self.path != "/generate":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if "prompt_ids" in body:
                        ids = [int(t) for t in body["prompt_ids"]]
                    elif "prompt" in body:
                        if outer.tokenizer is None:
                            self._json(400, {"error": "server has no "
                                             "tokenizer; send prompt_ids"})
                            return
                        ids = outer.tokenizer.encode(str(body["prompt"]))
                    else:
                        self._json(400, {"error": "need prompt or prompt_ids"})
                        return
                    sampling = dict(
                        n_predict=int(body.get("n_predict", 64)),
                        temp=(None if "temp" not in body
                              else float(body["temp"])),
                        top_k=(None if "top_k" not in body
                               else int(body["top_k"])),
                        top_p=(None if "top_p" not in body
                               else float(body["top_p"])))
                    if body.get("stream"):
                        self._stream(ids, sampling)
                        return
                    fut = outer.scheduler.submit(ids, **sampling)
                    try:
                        result = fut.result(timeout=request_timeout_s)
                    except Exception:
                        # timed out / failed: release the slot
                        if hasattr(outer.scheduler, "abort"):
                            outer.scheduler.abort(fut.request_id)
                        raise
                except json.JSONDecodeError:
                    self._json(400, {"error": "invalid JSON"})
                    return
                except Exception as e:   # timeout / engine failure
                    self._json(500, {"error": str(e)})
                    return
                payload = {"ids": result.ids, "new_ids": result.new_ids}
                if outer.tokenizer is not None:
                    payload["text"] = outer.tokenizer.decode(result.ids)
                self._json(200, payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        """Serve in a background thread (returns immediately)."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="biogpt-http", daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.scheduler.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-m", "--model", required=True, help="ggml-model .bin")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("-b", "--batch", type=int, default=16,
                   help="lockstep batch slots (kernel supports up to 32; "
                        "weight reads amortize across slots, so aggregate "
                        "throughput scales ~1.7x from 8->16 and ~2x from "
                        "8->32 at the cost of per-step latency)")
    p.add_argument("--max-seq", type=int, default=None)
    p.add_argument("--temp", type=float, default=0.0,
                   help="default temperature (requests may override)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (half the KV HBM traffic; wins "
                        "+12-23%% on long-window and mixed-length "
                        "traffic, flat on short uniform — RESULTS.md)")
    p.add_argument("--kv-groups", type=int, default=None,
                   help="group-clamped KV streaming: slot groups stop "
                        "paying KV traffic at their own live window "
                        "(mixed-length batches; default auto = 8 when "
                        "the batch divides, 0 disables)")
    args = p.parse_args(argv)

    from .modelio.checkpoint import load_params
    from .tokenizer import BioGptTokenizer

    try:
        config, vocab, merges, params = load_params(args.model)
    except FileNotFoundError:
        print(f"error: model file not found: {args.model}", file=sys.stderr)
        return 1
    tokenizer = BioGptTokenizer(vocab, merges)
    engine = BatchedEngine(config, params, max_batch=args.batch,
                           max_seq=args.max_seq, kv_quant=args.kv_quant,
                           kv_groups=args.kv_groups)
    scheduler = ServingScheduler(
        engine, GenerationParams(temp=args.temp))
    server = BioGptServer(scheduler, tokenizer,
                          host=args.host, port=args.port)
    print(f"serving on http://{server.host}:{server.port} "
          f"(B={args.batch} slots)", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
