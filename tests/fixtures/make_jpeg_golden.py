"""Regenerate tests/fixtures/jpeg_golden.npz.

The golden PIXELS come from the quantization-domain replica in
tests/test_codecs.py (pixel-domain math only — no huffman, no
bitstream), NOT from decode_jpeg, so the fixture is an independent
pre-computed reference for the decoder's entropy layer.

Run from the repo root:  python tests/fixtures/make_jpeg_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from afg_data_pipeline_spark.operators.codecs import encode_jpeg  # noqa: E402
from test_codecs import _jpeg_quantization_replica  # noqa: E402


def main() -> None:
    xx, yy = np.meshgrid(np.arange(37), np.arange(29))
    px = np.stack(
        [
            (xx * 7 + yy * 3) % 256,
            (xx * 255) // 36,
            ((xx // 4 + yy // 4) * 32) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    quality, subsample = 80, True
    jpeg = encode_jpeg(px, quality=quality, subsample=subsample,
                       restart_interval=3)
    golden = _jpeg_quantization_replica(px, quality, subsample)
    out = os.path.join(os.path.dirname(__file__), "jpeg_golden.npz")
    np.savez(
        out,
        jpeg=np.frombuffer(jpeg, dtype=np.uint8),
        pixels=golden,
    )
    print(f"wrote {out}: jpeg {len(jpeg)}B, pixels {golden.shape}")


if __name__ == "__main__":
    main()
