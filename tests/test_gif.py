"""GIF codec: LZW roundtrip, interlace, external interop, dispatch."""
from __future__ import annotations

import numpy as np
import pytest

from cozo_spark.operators.gif import _deinterlace, decode_gif, encode_gif

# the ubiquitous externally-authored 1x1 transparent tracking pixel
_PIXEL_GIF = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00!"
              b"\xf9\x04\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00"
              b"\x00\x02\x02D\x01\x00;")


def test_gif_roundtrip_small_palette():
    img = np.zeros((13, 17, 3), np.uint8)
    img[::2, :] = [255, 0, 0]
    img[:, ::3] = [0, 128, 255]
    img[5, 5] = [1, 2, 3]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_roundtrip_8bit_palette_many_clears():
    y, x = np.mgrid[0:20, 0:12]
    img = np.stack([(x * 20) % 256, (y * 12) % 256,
                    ((x + y) * 7) % 256], -1).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 200
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_external_interop():
    d = decode_gif(_PIXEL_GIF)
    assert d.shape == (1, 1, 3) and d.tolist() == [[[255, 255, 255]]]


def test_gif_deinterlace_pass_order():
    # 8 rows stored in pass order 0,8.. / 4.. / 2,6.. / 1,3,5,7
    stored = np.array([[0], [4], [2], [6], [1], [3], [5], [7]])
    assert (_deinterlace(stored).ravel() == np.arange(8)).all()


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"\x89PNG not a gif")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # no image block


def test_decode_image_dispatches_gif():
    from cozo_spark.operators.multimodal import decode_image

    img = np.tile(np.array([[10, 20, 30]], np.uint8), (4, 5, 1))
    out = decode_image(encode_gif(img), "image/gif")
    assert (out == img).all()
