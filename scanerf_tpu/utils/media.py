"""Demo media assembly: video/gif writers over rendered frame stacks.

Completes ``tools/tools.py:240-292`` (``generate_video`` /
``generate_gif`` / ``save_img_list``): mp4 via cv2.VideoWriter, gif via
imageio when available (gated — imageio is optional in this image).
Frames are RGB uint8 or float [0, 1] arrays.
"""

from __future__ import annotations

import os

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return img


def generate_video(save_path: str, frames, fps: int = 20) -> None:
    """Write an mp4 from RGB frames (tools.py:240-247)."""
    import cv2

    frames = [_to_u8(f) for f in frames]
    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(
        save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    try:
        for f in frames:
            out.write(f[..., ::-1])  # RGB -> BGR
    finally:
        out.release()


def generate_gif(save_path: str, frames, fps: int = 20) -> None:
    """Write a gif (tools.py:249-251). Needs imageio; raises a clear
    error otherwise (not baked into this image)."""
    try:
        import imageio
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "gif export needs the optional 'imageio' package; "
            "use generate_video (mp4) instead"
        ) from e
    imageio.mimsave(save_path, [_to_u8(f) for f in frames], fps=fps)


def save_img_list(save_dir: str, frames) -> None:
    """Dump frames as {idx}.png (tools.py:254-257)."""
    import cv2

    os.makedirs(save_dir, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(save_dir, f"{i}.png"), _to_u8(f)[..., ::-1])


def frames_from_dir(frame_dir: str) -> list[np.ndarray]:
    """Read {idx}.png frames back in index order (RGB)."""
    import cv2

    names = sorted(
        (f for f in os.listdir(frame_dir) if f.endswith(".png")),
        key=lambda n: int(os.path.splitext(n)[0]),
    )
    return [
        cv2.imread(os.path.join(frame_dir, n))[..., ::-1] for n in names
    ]
