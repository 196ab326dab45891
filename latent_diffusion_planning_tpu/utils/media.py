"""Image / video / HTML-report output helpers.

Parity with the reference's py_utils.save_image / save_video
(utils/py_utils.py:81-106) and utils/html_utils.py (dominate-based HTML
reports; re-implemented with plain string templating since dominate is not in
this image). Accepts float [0,1] / [-1,1] / [0,255] or uint8 arrays, HWC or
CHW, and normalizes to uint8 HWC.
"""

from __future__ import annotations

import base64
import io
from pathlib import Path
from typing import Sequence

import numpy as np


def to_uint8_hwc(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = img.transpose(1, 2, 0)  # CHW -> HWC
    if img.dtype != np.uint8:
        img = img.astype(np.float32)
        if img.min() < -0.01:           # [-1, 1]
            img = (img + 1.0) * 127.5
        elif img.max() <= 1.01:         # [0, 1]
            img = img * 255.0
        img = np.clip(img, 0, 255).astype(np.uint8)
    return img


def save_image(path: str | Path, img: np.ndarray) -> Path:
    from PIL import Image

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8_hwc(img)).save(path)
    return path


def save_video(path: str | Path, frames: Sequence[np.ndarray] | np.ndarray,
               fps: int = 10) -> Path:
    import imageio

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = [to_uint8_hwc(f) for f in np.asarray(frames)]
    if path.suffix == ".gif":
        imageio.mimsave(path, arr, duration=1.0 / fps)
        return path
    try:
        imageio.mimsave(path, arr, fps=fps)
    except (ValueError, ImportError):
        # no ffmpeg backend in this image — fall back to GIF
        path = path.with_suffix(".gif")
        imageio.mimsave(path, arr, duration=1.0 / fps)
    return path


class HTMLReport:
    """Minimal image-grid HTML report (VAE recon pages, rollout galleries).

    Images are embedded base64 so the report is a single self-contained file.
    """

    def __init__(self, title: str = "report"):
        self.title = title
        self._body: list[str] = []

    def add_header(self, text: str) -> None:
        self._body.append(f"<h2>{text}</h2>")

    def add_text(self, text: str) -> None:
        self._body.append(f"<p>{text}</p>")

    def add_images(self, images: Sequence[np.ndarray],
                   labels: Sequence[str] | None = None,
                   width: int = 128) -> None:
        from PIL import Image

        cells = []
        labels = labels or [""] * len(images)
        for img, label in zip(images, labels):
            buf = io.BytesIO()
            Image.fromarray(to_uint8_hwc(img)).save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            cells.append(
                f'<td style="text-align:center"><img width="{width}" '
                f'src="data:image/png;base64,{b64}"/><br/>{label}</td>')
        self._body.append(
            '<table><tr>' + "".join(cells) + "</tr></table>")

    def save(self, path: str | Path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        html = (f"<html><head><title>{self.title}</title></head><body>"
                f"<h1>{self.title}</h1>" + "\n".join(self._body)
                + "</body></html>")
        path.write_text(html)
        return path
