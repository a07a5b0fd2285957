"""Inference demo server -- capability parity with ``app_streamlit_demo.py``.

The reference ships a Streamlit app (load checkpoint -> predict single image ->
Grad-CAM overlay with a selectable target class, app_streamlit_demo.py:166-484).
Streamlit is not part of this image, so the demo is a dependency-free stdlib HTTP
server exposing the same workflow: upload an image, get class probabilities and a
Grad-CAM overlay (target = predicted class or a manual index).

Usage:
    python -m medmamba_tpu.cli.demo --checkpoint_path CKPT --medmb_size T \
        [--num_classes N --port 8501]
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import os
from http.server import BaseHTTPRequestHandler, HTTPServer

PAGE = """<!doctype html><html><head><title>MedMamba TPU demo</title>
<style>body{{font-family:sans-serif;max-width:720px;margin:2em auto}}
img{{max-width:320px;margin:4px;border-radius:6px}}
table{{border-collapse:collapse}} td,th{{padding:4px 10px;border:1px solid #ccc}}
</style></head><body>
<h2>MedMamba (TPU-native) inference demo</h2>
<form method="post" enctype="multipart/form-data">
<p><input type="file" name="image" accept="image/*" required>
Grad-CAM target class (-1 = predicted): <input type="number" name="target" value="-1" style="width:5em">
<button type="submit">Predict</button></p></form>
{random_form}
{result}
</body></html>"""

# Grad-CAM target selection for random picks: ground-truth class (from the
# image's class folder), predicted class, or a manual index -- the three
# target modes of the reference app (app_streamlit_demo.py:360-455).
RANDOM_FORM = """<form method="get" action="/random">
<p>or pick a random image from the test tree (<code>{test_dir}</code>):
target =
<select name="mode">
<option value="gt">ground-truth (from folder)</option>
<option value="pred">predicted</option>
<option value="manual">manual index:</option>
</select>
<input type="number" name="target" value="0" style="width:5em">
<button type="submit">Random image</button></p></form>"""


def build_app(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from medmamba_tpu.data.transforms import preprocess
    from medmamba_tpu.eval.gradcam import grad_cam, show_cam_on_image
    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.train.checkpoint import restore_params

    tree, meta = restore_params(args.checkpoint_path)
    num_classes = args.num_classes or meta.get("num_classes")
    class_indices = meta.get("class_indices") or {}
    idx_to_name = {int(v): str(k) for k, v in class_indices.items()} \
        if class_indices else {}
    name_to_idx = {str(k): int(v) for k, v in class_indices.items()}
    model = create_model(args.medmb_size, num_classes)
    if getattr(args, "scan_tau", "auto") != "auto":
        model = model.clone(scan_tau=int(args.scan_tau))
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}

    # The served model lives in a holder: on TPU with --scan_tau auto the
    # FIRST request calibrates the scan segment length in eval mode on that
    # request's own image (tau=chunk halves scan latency vs the tau=16
    # floor; a frozen checkpoint usually admits it). margin 0.8 covers
    # image-to-image drift of the measured budgets.
    holder = {"model": model,
              "calibrated": not (getattr(args, "scan_tau", "auto") == "auto"
                                 and jax.default_backend() == "tpu")}

    def _make_forward(m):
        @jax.jit
        def forward(variables, x):
            return jax.nn.softmax(m.apply(variables, x, True), -1)
        return forward

    holder["forward"] = _make_forward(model)

    def infer(img_bytes: bytes, target: int):
        img = Image.open(io.BytesIO(img_bytes)).convert("RGB").resize(
            (args.image_size, args.image_size), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)[None]
        x = preprocess(jax.random.key(0), jnp.asarray(arr),
                       size=args.image_size, augment=False)
        if not holder["calibrated"]:
            from medmamba_tpu.train.tau_select import select_scan_tau

            taus = select_scan_tau(holder["model"], variables["params"],
                                   variables["batch_stats"], x,
                                   image_size=args.image_size, margin=0.8,
                                   train_mode=False, gate=args.tau_gate)
            holder["model"] = holder["model"].clone(scan_tau=taus)
            holder["forward"] = _make_forward(holder["model"])
            holder["calibrated"] = True
            print(f"scan tau (serving auto-selection): {taus}")
        probs = np.asarray(holder["forward"](variables, x))[0]
        pred = int(probs.argmax())
        tc = pred if target < 0 else int(target)
        cam = grad_cam(holder["model"], variables, x,
                       target_class=np.array([tc]))[0]
        overlay = show_cam_on_image(np.asarray(img, np.float32) / 255.0, cam)
        return img, overlay, probs, pred, tc

    def render(img, overlay, probs, pred, tc):
        def b64(pil_or_arr):
            from PIL import Image as I
            im = pil_or_arr if hasattr(pil_or_arr, "save") \
                else I.fromarray(pil_or_arr)
            buf = io.BytesIO()
            im.save(buf, "PNG")
            return base64.b64encode(buf.getvalue()).decode()

        name = idx_to_name.get(pred, str(pred))
        rows = "".join(
            f"<tr><td>{idx_to_name.get(i, i)}</td><td>{p:.4f}</td></tr>"
            for i, p in enumerate(probs))
        return (f"<h3>Prediction: {name} ({probs[pred]:.3f})"
                f" &mdash; Grad-CAM target: {idx_to_name.get(tc, tc)}</h3>"
                f'<img src="data:image/png;base64,{b64(img)}">'
                f'<img src="data:image/png;base64,{b64(overlay)}">'
                f"<table><tr><th>class</th><th>prob</th></tr>{rows}</table>")

    def class_of(path: str):
        """Ground-truth class index of a class-folder image: the parent
        directory name, looked up in class_indices (folder mode) or parsed
        from the 'class_<v>' convention (NPZ-prep trees)."""
        folder = os.path.basename(os.path.dirname(path))
        if folder in name_to_idx:
            return name_to_idx[folder]
        if folder.startswith("class_") and folder[6:].isdigit():
            return int(folder[6:])
        return None

    return infer, render, class_of


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser (the stdlib cgi module is gone in 3.12).

    Returns (image_bytes, target_int)."""
    import re
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("not multipart/form-data")
    boundary = m.group(1).encode()
    image, target = None, -1
    for part in body.split(b"--" + boundary):
        if b"\r\n\r\n" not in part:
            continue
        head, _, payload = part.partition(b"\r\n\r\n")
        payload = payload.rstrip(b"\r\n-")
        head_l = head.decode(errors="replace").lower()
        if 'name="image"' in head_l:
            image = payload
        elif 'name="target"' in head_l:
            try:
                target = int(payload.decode().strip() or "-1")
            except ValueError:
                target = -1
    if image is None:
        raise ValueError("no image field in form")
    return image, target


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", required=True,
                   help="framework checkpoint dir, or a reference torch .pth "
                        "file (auto-converted in memory, test.py:76-77 "
                        "parity)")
    p.add_argument("--medmb_size", default="T", choices=["T", "S", "B", "Te"])
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--scan_tau", type=str, default="auto",
                   choices=["auto", "16", "32", "64", "128"],
                   help="Scan segment length for the served forwards (same "
                        "dial as the train CLI). 'auto' calibrates on the "
                        "first request's image on TPU; a number forces it.")
    p.add_argument("--tau_gate", type=str, default="outcome",
                   choices=["outcome", "exact"],
                   help="Budget gate for --scan_tau auto (round 5): "
                        "'outcome' selects tau by measured outcome safety "
                        "with the overflow-hardened clip 20 (fast); "
                        "'exact' keeps the bit-exact bound (clip 80).")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--host", type=str, default="127.0.0.1",
                   help="bind address (default loopback; pass 0.0.0.0 "
                        "explicitly to expose the server)")
    p.add_argument("--test_dir", type=str, default=None,
                   help="class-folder tree for the random-image source; "
                        "fixed at launch (clients cannot request arbitrary "
                        "filesystem paths)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    # kernel clip is read once at import: harden it for outcome-gated or
    # forced taus (fp32 overflow hazard on beyond-budget segments at clip
    # 80 -- ROUND5_NOTES session 2); explicit MEDMAMBA_SCAN_CLIP env wins
    if args.tau_gate == "outcome" or getattr(args, "scan_tau", "auto") != "auto":
        os.environ.setdefault("MEDMAMBA_SCAN_CLIP", "20")
    from medmamba_tpu.ops.pallas_scan import guard_ablation_unset
    guard_ablation_unset()

    infer, render, class_of = build_app(args)
    random_form = (RANDOM_FORM.format(test_dir=args.test_dir)
                   if args.test_dir else "")

    def page(result=""):
        return PAGE.format(random_form=random_form, result=result)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, html, code=200):
            body = html.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            # "random image from a folder tree" source, parity with the
            # reference app's second image source (app_streamlit_demo.py:248-327);
            # the source tree is fixed at launch (--test_dir).
            if self.path.startswith("/random"):
                import random as _random
                import urllib.parse
                q = urllib.parse.parse_qs(
                    urllib.parse.urlparse(self.path).query)
                mode = (q.get("mode") or ["gt"])[0]
                try:
                    manual = int((q.get("target") or ["0"])[0])
                except ValueError:
                    manual = 0
                exts = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".webp")
                files = []
                if args.test_dir and os.path.isdir(args.test_dir):
                    for base, _, names in os.walk(args.test_dir):
                        files += [os.path.join(base, n) for n in names
                                  if n.lower().endswith(exts)]
                if not files:
                    self._send(page("<p style='color:red'>no images found"
                                    f" under --test_dir {args.test_dir!r}"
                                    "</p>"))
                    return
                path = _random.choice(files)
                with open(path, "rb") as f:
                    data = f.read()
                if mode == "manual":
                    target = manual
                elif mode == "gt":
                    target = class_of(path)
                    if target is None:
                        target = -1  # folder name unknown -> predicted
                else:
                    target = -1
                try:
                    gt = class_of(path)
                    note = (f"<p>random pick: <code>{path}</code>"
                            + (f" (ground truth: class {gt})"
                               if gt is not None else "") + "</p>")
                    out = note + render(*infer(data, target))
                except Exception as e:
                    out = f"<p style='color:red'>error: {e}</p>"
                self._send(page(out))
                return
            self._send(page())

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            data, target = _parse_multipart(
                body, self.headers.get("Content-Type", ""))
            try:
                out = render(*infer(data, target))
            except Exception as e:  # surface errors in the page
                out = f"<p style='color:red'>error: {e}</p>"
            self._send(page(out))

        def log_message(self, *a):
            pass

    srv = HTTPServer((args.host, args.port), Handler)
    print(f"MedMamba demo listening on http://{args.host}:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
