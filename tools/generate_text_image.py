"""Synthetic text-image fixture generator (FIXTURES.md F4).

Mirror of the reference's smoke-image tool
(/root/reference/tools/generate_text_image.py:23-77 and
tests/test_synthetic_ocr.py:66-85): a white 1280x720 PNG with black text
drawn at (64, 64). No PIL in this container, so the PNG is written
directly (zlib + struct, valid RGB8 non-interlaced) and the text is drawn
with an embedded 5x7 bitmap font (A-Z, 0-9, underscore), scaled up.

The source text is ALSO stored in a PNG ``tEXt`` chunk (key ``ocr-text``)
— the hook for the deterministic metadata-reading fake OCR engine
(SURVEY.md §5: "deterministic text-from-image-metadata function standing
in for DeepSeek-OCR-2"), so conformance tests can assert the reference's
normalized-containment property end-to-end without a GPU.

Usage: python tools/generate_text_image.py OUT.png [TEXT]
"""

from __future__ import annotations

import struct
import sys
import zlib

DEFAULT_TEXT = "HELLO_DEEPSEEK_OCR2_12345"
WIDTH, HEIGHT = 1280, 720
ORIGIN = (64, 64)
SCALE = 8  # 5x7 glyphs at 8x -> 40x56 px, close to the reference's 64 px font

# 5x7 bitmap font rows (MSB-left, 5 bits used), A-Z 0-9 _ and space
_FONT: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x13, 0x15, 0x15, 0x15, 0x19, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "_": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1F),
    " ": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00),
}


def _render_bitmap(text: str) -> bytearray:
    """White RGB canvas with the text drawn in black glyphs."""
    canvas = bytearray(b"\xff" * (WIDTH * HEIGHT * 3))
    x0, y0 = ORIGIN
    for ci, ch in enumerate(text.upper()):
        glyph = _FONT.get(ch, _FONT[" "])
        gx = x0 + ci * (6 * SCALE)
        for row in range(7):
            bits = glyph[row]
            for col in range(5):
                if not (bits >> (4 - col)) & 1:
                    continue
                for dy in range(SCALE):
                    y = y0 + row * SCALE + dy
                    if y >= HEIGHT:
                        continue
                    base = (y * WIDTH + gx + col * SCALE) * 3
                    for dx in range(SCALE):
                        if gx + col * SCALE + dx >= WIDTH:
                            continue
                        p = base + dx * 3
                        canvas[p : p + 3] = b"\x00\x00\x00"
    return canvas


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_text_png(path: str, text: str = DEFAULT_TEXT) -> None:
    canvas = _render_bitmap(text)
    raw = bytearray()
    stride = WIDTH * 3
    for y in range(HEIGHT):
        raw.append(0)  # filter: None
        raw += canvas[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", WIDTH, HEIGHT, 8, 2, 0, 0, 0)
    png = b"".join(
        [
            b"\x89PNG\r\n\x1a\n",
            _chunk(b"IHDR", ihdr),
            _chunk(b"tEXt", b"ocr-text\x00" + text.encode("latin-1")),
            _chunk(b"IDAT", zlib.compress(bytes(raw), 6)),
            _chunk(b"IEND", b""),
        ]
    )
    with open(path, "wb") as f:
        f.write(png)


def read_text_chunk(data: bytes) -> str | None:
    """Extract the ``ocr-text`` tEXt payload from PNG bytes."""
    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"tEXt" and payload.startswith(b"ocr-text\x00"):
            return payload[len(b"ocr-text\x00"):].decode("latin-1")
        if tag == b"IEND":
            break
        pos += 12 + length
    return None


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "synthetic_text.png"
    text = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_TEXT
    write_text_png(out, text)
    print(f"wrote {out} ({WIDTH}x{HEIGHT}, text={text!r})")
