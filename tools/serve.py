"""Serving runtime for AOT exports — the deployment end of tools/export.py.

The reference stops at raw weights (`final_state.pth`,
`/root/reference/tools/train.py:331-337`); deployment is left to the
user. Here the deployable artifact is the export directory
(`pose_infer.stablehlo` + orbax `final_state`), and this CLI turns it
into a running service with NO model code on the serving host: the
StableHLO module is deserialized via `jax.export`, the weights restore
as a raw orbax tree, and a threaded HTTP server answers

  GET  /healthz            -> JSON {status, batch, image_hw, n_params,
                              outputs}
  POST /predict            -> body: .npy float32 (B, H, W, 3) normalized
                              images; response: .npy float32 (B, J, 3)
                              [x, y in heatmap coords, score] for
                              top-down exports, or a .npz of named
                              arrays (heat, tags, peak_*) for bottom-up
                              exports — feed those to
                              evaluation.grouping.parse_bottomup

Fixed-batch modules (export --batch N) transparently pad partial
batches to the compiled size and slice the result; batch-polymorphic
modules (export --batch 0) call through at the request's size. Device
calls are serialized under a lock — one compiled program, bounded
device memory; concurrency comes from HTTP threads overlapping host
decode with device compute.

Usage:
  python tools/serve.py --export_dir <dir> [--port 8389] [--host 0.0.0.0]
"""

import io
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])


class PoseServer:
    """Deserialized export + weights; thread-safe predict."""

    def __init__(self, export_dir: str):
        import jax
        import numpy as np
        import orbax.checkpoint as ocp
        from jax import export as jexport

        blob_path = os.path.join(export_dir, "pose_infer.stablehlo")
        with open(blob_path, "rb") as f:
            self.exported = jexport.deserialize(bytearray(f.read()))
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.path.join(export_dir, "final_state"))
        )
        if not (isinstance(restored, dict) and "params" in restored):
            raise ValueError(
                f"{export_dir}/final_state is not a full variables dict "
                "(re-export with the current tools/export.py)"
            )
        self.params = restored["params"]
        self.batch_stats = restored.get("batch_stats", {})
        self.n_params = int(
            sum(np.asarray(p).size for p in jax.tree.leaves(self.params))
        )

        img_aval = self.exported.in_avals[-1]
        b, h, w, _c = img_aval.shape
        self.image_hw = (int(h), int(w))
        # polymorphic exports carry a symbolic leading dim
        self.batch = int(b) if isinstance(b, int) else 0
        self._lock = threading.Lock()
        self._np = np
        # warmup (compiles the module once before the first request);
        # bottom-up exports return a dict of named arrays (heat/tags/peaks)
        wb = self.batch or 1
        out = self.predict(np.zeros((wb, h, w, 3), np.float32))
        self.output_names = sorted(out) if isinstance(out, dict) else None

    def predict(self, images):
        np = self._np
        h, w = self.image_hw
        if images.ndim != 4 or images.shape[1:] != (h, w, 3):
            raise ValueError(
                f"expected (B, {h}, {w}, 3) float32, got {images.shape}"
            )
        n = images.shape[0]
        x = np.asarray(images, np.float32)
        if self.batch:
            if n > self.batch:
                raise ValueError(
                    f"batch {n} exceeds compiled size {self.batch}; "
                    "re-export with --batch 0 for polymorphic serving"
                )
            if n < self.batch:
                pad = np.repeat(x[-1:], self.batch - n, axis=0)
                x = np.concatenate([x, pad], axis=0)
        with self._lock:
            out = self.exported.call(self.params, self.batch_stats, x)
        if isinstance(out, dict):
            return {k: np.asarray(v)[:n] for k, v in out.items()}
        return np.asarray(out)[:n]


def make_handler(server: PoseServer):
    from http.server import BaseHTTPRequestHandler

    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet per-request stderr spam
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                self._send(404, b"not found", "text/plain")
                return
            info = {
                "status": "ok",
                "batch": server.batch or "polymorphic",
                "image_hw": list(server.image_hw),
                "n_params": server.n_params,
                "outputs": server.output_names or "preds",
            }
            self._send(200, json.dumps(info).encode(), "application/json")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                arr = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                preds = server.predict(arr)
                buf = io.BytesIO()
                if isinstance(preds, dict):  # bottom-up: named arrays
                    np.savez(buf, **preds)
                else:
                    np.save(buf, preds, allow_pickle=False)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # surface the reason to the client
                self._send(400, str(e).encode(), "text/plain")

    return Handler


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--export_dir", required=True)
    ap.add_argument("--port", type=int, default=8389,
                    help="0 picks an ephemeral port (printed on stdout)")
    ap.add_argument("--host", type=str, default="127.0.0.1")
    args = ap.parse_args(argv)

    from http.server import ThreadingHTTPServer

    server = PoseServer(args.export_dir)
    httpd = ThreadingHTTPServer(
        (args.host, args.port), make_handler(server)
    )
    print(
        f"serving pose model on http://{args.host}:{httpd.server_port} "
        f"(batch {server.batch or 'polymorphic'}, "
        f"image {server.image_hw[1]}x{server.image_hw[0]}, "
        f"{server.n_params / 1e6:.1f}M params)",
        flush=True,
    )
    httpd.serve_forever()


if __name__ == "__main__":
    main()
