"""Multimodal column support: image/audio/video as opaque binary
columns with typed metadata (extension layer, BASELINE.json north
star).

The container has no image/audio codecs, so the *decode kernels* are
stubbed exactly as the task prescribes: either a clearly-marked
NotImplementedError (real codec path) or a deterministic fake
(byte-level features) — while ALL the Spark-side plumbing is real and
tested: the asset schema, Arrow batch shape through ``mapInPandas``,
partition sizing, and metadata pushdown.

Scale design: binary payloads ride in their own column so Parquet
keeps them in separate column chunks — metadata-only queries never
read the bytes (column pruning); decode/feature stages are
``mapInPandas`` so each Arrow batch holds a bounded number of
payloads (maxRecordsPerBatch) instead of whole-row Python pickling.

Codec support boundary (every unsupported variant raises a
clearly-worded NotImplementedError — refuse, never mis-decode):

- **PPM**: binary P6, maxval 255.
- **BMP**: uncompressed 24/32 bpp, BITMAPINFOHEADER.
- **PNG**: 8-bit gray/RGB/RGBA (non-palette), non-interlaced; all
  five filter types. Adam7 interlace and palettes raise.
- **JPEG** (pure-python T.81 decoder, `_decode_jpeg`): baseline
  sequential DCT (SOF0/SOF1) with 8-bit precision, 4:4:4 / 4:2:2 /
  4:2:0 chroma subsampling, restart markers (DRI/RSTn). Progressive
  (SOF2), arithmetic coding (SOF9+), 12-bit precision, and 16-bit
  quantization tables raise NotImplementedError with the variant
  named.
- **WAV**: PCM 8/16-bit. **Video**: contract stub only (container
  parsing raises; frame-sampling plumbing is real and tested against
  the deterministic fake decoder).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, src_col: str, media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Build a multimodal table from any column by treating its UTF-8
    bytes as the payload (the deterministic stand-in for real media
    ingestion). Adds ``payload binary`` + ``asset_meta`` struct."""
    payload = F.encode(F.col(src_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.octet_length(F.col(src_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("asset_meta", meta)


def _decode_ppm(b: bytes) -> tuple[int, int, int, bytes]:
    """Netpbm PPM decoder (P6 binary / P3 ascii), pure Python. Header
    per spec: magic, then width/height/maxval as whitespace-separated
    tokens with '#' comments allowed; P6 raw samples follow the single
    whitespace after maxval. Only maxval=255 (1 byte/sample) is
    supported — the universal case."""
    pos = 2
    vals: list[int] = []
    n = len(b)
    while len(vals) < 3:
        while pos < n and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            nl = b.find(b"\n", pos)
            if nl < 0:
                raise NotImplementedError("truncated PPM header")
            pos = nl + 1
            continue
        start = pos
        while pos < n and not b[pos : pos + 1].isspace():
            pos += 1
        try:
            vals.append(int(b[start:pos]))
        except ValueError:
            raise NotImplementedError("malformed PPM header") from None
    w, h, maxv = vals
    if maxv != 255 or w <= 0 or h <= 0:
        raise NotImplementedError("only maxval=255 PPM is supported")
    need = w * h * 3
    if b[:2] == b"P6":
        pos += 1  # exactly one whitespace byte after maxval, per spec
        raw = b[pos : pos + need]
        if len(raw) < need:
            raise NotImplementedError("truncated PPM payload")
        return w, h, 3, raw
    toks = b[pos:].split()
    if len(toks) < need:
        raise NotImplementedError("truncated PPM payload")
    return w, h, 3, bytes(int(t) for t in toks[:need])


def _decode_bmp(b: bytes) -> tuple[int, int, int, bytes]:
    """BMP decoder (BITMAPINFOHEADER+, uncompressed 24/32bpp), pure
    Python + numpy. Undoes everything the container does to pixels:
    BGR(A) channel order -> RGB, bottom-up row order -> top-down, and
    4-byte row-stride padding stripped."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_sz = struct.unpack_from("<I", b, 14)[0]
    if hdr_sz < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h_signed == 0:
        raise NotImplementedError("only uncompressed 24/32bpp BMP is supported")
    bottom_up = h_signed > 0
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) // 4 * 4
    if len(b) < data_off + stride * h:
        raise NotImplementedError("truncated BMP payload")
    grid = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    grid = grid.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        grid = grid[::-1]
    rgb = grid[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_row(
    f: int, row, prev, nch: int
):  # row/prev: int32 ndarrays, returns reconstructed int32 row
    """Undo one PNG scanline filter (spec §6: None/Sub/Up/Average/
    Paeth). Sub/Average/Paeth are inherently sequential in x (each
    byte depends on the reconstructed byte bpp to the left), so those
    run a per-byte loop; None and Up vectorize."""
    import numpy as np

    stride = row.shape[0]
    if f == 0:
        return row.copy()
    if f == 2:
        return (row + prev) & 0xFF
    rec = row.copy()
    if f == 1:
        for x in range(nch, stride):
            rec[x] = (rec[x] + rec[x - nch]) & 0xFF
        return rec
    if f == 3:
        for x in range(stride):
            a = rec[x - nch] if x >= nch else 0
            rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        return rec
    if f == 4:
        for x in range(stride):
            a = int(rec[x - nch]) if x >= nch else 0
            c = int(prev[x - nch]) if x >= nch else 0
            up = int(prev[x])
            p = a + up - c
            pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = up
            else:
                pred = c
            rec[x] = (rec[x] + pred) & 0xFF
        return rec
    raise NotImplementedError(f"PNG filter type {f} is not in the spec")


def _decode_png(b: bytes) -> tuple[int, int, int, bytes]:
    """PNG decoder, pure stdlib (struct + zlib) + numpy: chunk walk
    (IHDR/IDAT*/IEND), one zlib inflate over the concatenated IDAT
    stream, then per-scanline unfiltering (all five spec filter
    types). Supports non-interlaced 8-bit greyscale (0), RGB (2),
    grey+alpha (4) and RGBA (6); palette (3), 16-bit, and Adam7
    interlacing keep the stub contract. Output is row-major RGB with
    alpha dropped — same contract as the PPM/BMP decoders."""
    import struct
    import zlib

    import numpy as np

    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos = 8
    w = h = bit = ct = interlace = None
    idat: list[bytes] = []
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            if len(data) != 13:
                raise NotImplementedError("malformed PNG IHDR")
            w, h, bit, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise NotImplementedError("truncated PNG payload")
    if bit != 8:
        raise NotImplementedError("only 8-bit PNG is supported")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG is not supported")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ct)
    if nch is None:
        raise NotImplementedError("palette PNG is not supported")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise NotImplementedError(f"corrupt PNG IDAT stream: {e}") from None
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise NotImplementedError("truncated PNG payload")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
        p += stride + 1
        rec = _png_unfilter_row(f, row, prev, nch)
        out[y] = rec.astype(np.uint8)
        prev = rec
    arr = out.reshape(h, w, nch)
    if ct == 0:
        rgb = np.repeat(arr, 3, axis=2)
    elif ct == 4:
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
    elif ct == 6:
        rgb = arr[:, :, :3]
    else:
        rgb = arr
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


# ---------------------------------------------------------------------------
# baseline sequential JPEG (ITU-T T.81 / ISO 10918-1, public spec):
# pure stdlib + numpy — Huffman entropy decode, dequantization, 8x8
# IDCT, chroma upsampling, JFIF YCbCr->RGB. Progressive (SOF2),
# arithmetic coding, 12-bit precision, and hierarchical modes stay
# behind the explicit NotImplementedError contract.
# ---------------------------------------------------------------------------

# zigzag scan order: _JPEG_ZZ[k] = natural (row-major) index of the
# k-th zigzag position
_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_JPEG_IDCT_M = None  # lazy 8x8 DCT-III basis


def _jpeg_idct_matrix():
    global _JPEG_IDCT_M
    if _JPEG_IDCT_M is None:
        import math

        import numpy as np

        m = np.zeros((8, 8), dtype=np.float64)
        for u in range(8):
            cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
            for x in range(8):
                m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
        _JPEG_IDCT_M = m
    return _JPEG_IDCT_M


def _jpeg_build_huffman(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman per T.81 Annex C: (code length, code) ->
    symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment (byte
    stuffing already stripped)."""

    __slots__ = ("d", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise NotImplementedError("truncated JPEG entropy data")
            self.buf = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid JPEG Huffman code")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    """Baseline sequential JPEG -> (w, h, 3, row-major RGB bytes).
    Handles multi-table DQT/DHT segments, restart intervals, 4:4:4 /
    4:2:0 / arbitrary sampling (nearest-replication upsampling, the
    T.81 Annex default), greyscale and 3-component YCbCr."""
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            raise NotImplementedError("malformed JPEG marker stream")
        m = b[i + 1]
        i += 2
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            continue
        if m == 0xD9:
            break
        if i + 2 > len(b):
            raise NotImplementedError("truncated JPEG segment")
        seg_len = int.from_bytes(b[i : i + 2], "big")
        seg = b[i + 2 : i + seg_len]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    raise NotImplementedError(
                        "16-bit JPEG quantization tables are not supported"
                    )
                qt[tq] = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                p += 64
        elif m in (0xC0, 0xC1):  # baseline / extended-sequential Huffman
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG precision is supported")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                comps.append(
                    {
                        "id": seg[6 + 3 * c],
                        "h": seg[7 + 3 * c] >> 4,
                        "v": seg[7 + 3 * c] & 15,
                        "tq": seg[8 + 3 * c],
                    }
                )
            frame = (fw, fh, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported — "
                "progressive/lossless/arithmetic modes keep the codec stub"
            )
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(seg[p : p + n])
                p += n
                (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_build_huffman(
                    bits, vals
                )
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS — single scan (baseline), entropy data follows
            ns = seg[0]
            scomps = []
            for c in range(ns):
                scomps.append((seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15))
            scan = (scomps, i + seg_len)
            break
        i += seg_len
    if frame is None or scan is None:
        raise NotImplementedError("JPEG without SOF0+SOS is not supported")
    w, h, comps = frame
    scomps, p = scan
    # entropy-coded segments: strip byte stuffing, split at restarts
    segs: list[bytes] = []
    cur = bytearray()
    n_b = len(b)
    while p < n_b:
        x = b[p]
        if x != 0xFF:
            cur.append(x)
            p += 1
            continue
        nxt = b[p + 1] if p + 1 < n_b else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:
            break  # EOI or next marker: single-scan baseline ends here
    segs.append(bytes(cur))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _td, _ta in scomps]
    tabs = {cs: (td, ta) for cs, td, ta in scomps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcy * 8 * c["v"], mcx * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }
    M = _jpeg_idct_matrix()
    zz = _JPEG_ZZ
    preds = {c["id"]: 0 for c in comps}
    seg_i = 0
    br = _JpegBitReader(segs[0])
    for mcu in range(mcx * mcy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise NotImplementedError("missing JPEG restart segment")
            br = _JpegBitReader(segs[seg_i])
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcx)
        for c in order:
            td, ta = tabs[c["id"]]
            q = qt[c["tq"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    s = br.read_huff(huff_dc[td])
                    preds[c["id"]] += br.receive_extend(s)
                    coefz = np.zeros(64, dtype=np.int32)
                    coefz[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = br.read_huff(huff_ac[ta])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise NotImplementedError("corrupt JPEG AC run")
                        coefz[k] = br.receive_extend(s)
                        k += 1
                    dq = (coefz * q).astype(np.float64)
                    block = np.zeros(64, dtype=np.float64)
                    block[zz] = dq  # un-zigzag
                    spat = M.T @ block.reshape(8, 8) @ M + 128.0
                    y0 = (my * c["v"] + v) * 8
                    x0 = (mx * c["h"] + hh) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spat
    out = {}
    for c in comps:
        pl = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        out[c["id"]] = pl[:h, :w]
    if len(comps) == 1:
        y = np.clip(np.rint(next(iter(out.values()))), 0, 255).astype(np.uint8)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    elif len(comps) == 3:
        yy = out[comps[0]["id"]]
        cb = out[comps[1]["id"]] - 128.0
        cr = out[comps[2]["id"]] - 128.0
        r = yy + 1.402 * cr
        g = yy - 0.344136 * cb - 0.714136 * cr
        bl = yy + 1.772 * cb
        rgb = np.clip(np.rint(np.stack([r, g, bl], axis=2)), 0, 255).astype(
            np.uint8
        )
    else:
        raise NotImplementedError("JPEG with 2 or 4 components is not supported")
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


class _JpegBitWriter:
    """MSB-first bit writer with T.81 byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write_bits(self, v: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.buf = (self.buf << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write_bits(1, 1)  # pad with 1s per spec


# encoder Huffman tables (custom, spec-legal canonical sets): DC —
# twelve 4-bit codes for categories 0..11 (code 1111 unused, as the
# all-ones code must be); AC — the single 1-bit code "0" for EOB.
_JPEG_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_ENC_DC_VALS = list(range(12))
_JPEG_ENC_AC_BITS = [1] + [0] * 15
_JPEG_ENC_AC_VALS = [0x00]


def encode_jpeg_blocks(
    w: int,
    h: int,
    block_vals,
    color: bool = True,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder — the deterministic twin
    generator for the JPEG decode gates. The image is a grid of solid
    8x8 blocks: ``block_vals[by][bx]`` (any indexable of indexables of
    0..255 ints) is the luma of block (bx, by); quantization tables
    are all-ones and every block is DC-only, so the decode is EXACT
    (IDCT of a pure-DC block is a flat block) and a SQL oracle can
    compute every decoded pixel closed-form. ``color=True`` writes a
    3-component YCbCr frame with neutral chroma (Cb=Cr=128 — zero
    after level shift, so RGB == luma exactly through the JFIF
    matrix); ``color=False`` writes single-component greyscale. The
    entropy stream still exercises the real Huffman path: DC
    categories vary with the per-block DPCM diffs.

    ``subsampling=(2, 2)`` (color only) writes a 4:2:0 frame — luma
    H=V=2, one chroma block per 16x16 MCU, edge-clamped luma padding
    blocks for partial MCUs — and since neutral chroma stays neutral
    under the decoder's nearest-replication upsampling, the SAME
    closed-form pixel oracle holds. ``restart_interval=N`` emits a DRI
    segment plus byte-aligned RSTm markers with DC-predictor resets
    every N MCUs (T.81 restart semantics). Both exist so the decode
    gate exercises the decoder's subsampling/restart paths, not just
    4:4:4 single-segment streams."""
    import struct

    sh, sv = subsampling if color else (1, 1)
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsampling factors must be 1 or 2")
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    mcx = (bw + sh - 1) // sh
    mcy = (bh + sv - 1) // sv
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, 8-bit, all ones (zigzag order — identity here);
    # segment = 2-byte length (2 + 1 + 64) + Pq/Tq byte + 64 entries
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    ncomp = 3 if color else 1
    # SOF0: luma carries the sampling factors, chroma is always 1x1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hv = (sh << 4) | sv if cid == 1 else 0x11
        sof += struct.pack(">BBB", cid, hv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 + AC table 0
    dht = (
        bytes([0x00]) + bytes(_JPEG_ENC_DC_BITS) + bytes(_JPEG_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_ENC_AC_BITS) + bytes(_JPEG_ENC_AC_VALS)
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_table = _jpeg_build_huffman(_JPEG_ENC_DC_BITS, _JPEG_ENC_DC_VALS)
    dc_code = {
        sym: (length, code) for (length, code), sym in dc_table.items()
    }
    bwr = _JpegBitWriter()
    preds = [0] * ncomp

    def _emit(ci: int, dc: int) -> None:
        diff = dc - preds[ci]
        preds[ci] = dc
        s = abs(diff).bit_length()
        length, code = dc_code[s]
        bwr.write_bits(code, length)
        if s:
            bwr.write_bits(diff if diff > 0 else diff + (1 << s) - 1, s)
        bwr.write_bits(0, 1)  # AC: EOB (code "0")

    rst = 0
    for mcu in range(mcx * mcy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bwr.flush()  # byte-align before the marker
            bwr.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcx)
        # luma: v-major then h within the MCU (the T.81 interleave the
        # decoder walks); blocks past the image edge are clamped
        # padding — decoded then cropped away
        for v in range(sv):
            for hh in range(sh):
                by = min(my * sv + v, bh - 1)
                bx = min(mx * sh + hh, bw - 1)
                # luma DC for a flat block of value val is 8*(val-128)
                _emit(0, 8 * (int(block_vals[by][bx]) - 128))
        if color:
            _emit(1, 0)  # neutral chroma: DC 0 under all-ones quant
            _emit(2, 0)
    bwr.flush()
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def plant_test_images_jpeg(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic planted-JPEG corpus for the JPEG decode gate: per
    id, a (8*(1 + id%3) + id%5) x (8*(1 + id%2) + id%7) image of solid
    8x8 blocks whose block (bx, by) has luma (id*31 + bx*17 + by*29) %
    256 — 3-component neutral-chroma YCbCr for even ids, greyscale for
    odd — so every decoded pixel is closed-form in the id (DC-only
    blocks under all-ones quantization decode exactly) while the Spark
    side must genuinely Huffman-decode, dequantize, IDCT, and
    color-convert the container. Edge blocks crop (dims are not
    multiples of 8), exercising the partial-MCU path. The CONTAINER
    varies by id class while the decoded pixels stay on the same
    closed form, so one oracle gates every decoder path: id % 4 == 0
    -> 4:2:0 with restart markers every 2 MCUs, id % 4 == 2 -> 4:4:4
    with restart markers every 3 MCUs, other even ids plain 4:4:4,
    odd ids greyscale."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w = 8 * (1 + rid % 3) + rid % 5
                h = 8 * (1 + rid % 2) + rid % 7
                bw, bh = (w + 7) // 8, (h + 7) // 8
                vals = [
                    [(rid * 31 + bx * 17 + by * 29) % 256 for bx in range(bw)]
                    for by in range(bh)
                ]
                if rid % 4 == 0:
                    kw = dict(color=True, subsampling=(2, 2),
                              restart_interval=2)
                elif rid % 4 == 2:
                    kw = dict(color=True, restart_interval=3)
                else:
                    kw = dict(color=False)
                payloads.append(encode_jpeg_blocks(w, h, vals, **kw))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    from ._util import spread

    return spread(df.select(id_col)).mapInPandas(_gen, schema=schema)


_CODEC_STUB_MSG = (
    "image decode requires PIL/cv2 for this format (not installed; "
    "native decoders cover PPM P6/P3, uncompressed 24/32bpp BMP, "
    "non-interlaced 8-bit greyscale/RGB/RGBA PNG, and baseline "
    "sequential JPEG — progressive/arithmetic JPEG and video stay "
    "stubbed); use extract_byte_features for the deterministic fake path"
)


def _decode_payload(b: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes: (width, height, channels, rgb bytes).
    Formats beyond the pure-Python-decodable containers keep the
    explicit stub contract (NotImplementedError naming the installed
    alternative) — the seam a PIL/cv2 drop-in replaces."""
    if b[:2] in (b"P6", b"P3"):
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        return _decode_jpeg(b)
    raise NotImplementedError(_CODEC_STUB_MSG)


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    """Minimal P6 encoder — the deterministic twin generator for
    decode tests/oracles (and a real writer for the formats we read)."""
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


def encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """Minimal 24bpp bottom-up BMP encoder (RGB in, container's
    BGR + stride padding + bottom-up order out)."""
    import struct

    import numpy as np

    stride = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - w * 3)
    arr = np.frombuffer(rgb, np.uint8, count=w * h * 3).reshape(h, w, 3)
    bgr = arr[::-1, :, [2, 1, 0]]  # bottom-up + BGR
    data = b"".join(
        np.ascontiguousarray(bgr[r]).tobytes() + pad for r in range(h)
    )
    off = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return fh + ih + data


def encode_png(
    w: int, h: int, pixels: bytes, color_type: int = 2, filter_seed: int = 0
) -> bytes:
    """Minimal PNG encoder (stdlib struct/zlib + numpy) — the
    deterministic twin generator for the PNG decode gates. ``pixels``
    is the row-major byte stream for ``color_type`` (2=RGB 3ch,
    6=RGBA 4ch, 0=grey 1ch). Each scanline y is filtered with type
    ``(filter_seed + y) % 5``, so a round-trip through a corpus of
    these exercises every spec filter (None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    import numpy as np

    nch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * nch
    arr = np.frombuffer(pixels, np.uint8, count=h * stride).reshape(h, stride)
    arr32 = arr.astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = arr32[y]
        f = (filter_seed + y) % 5
        if f == 0:
            filt = row
        elif f == 1:
            filt = row.copy()
            filt[nch:] = (row[nch:] - row[:-nch]) & 0xFF
        elif f == 2:
            filt = (row - prev) & 0xFF
        elif f == 3:
            filt = row.copy()
            for x in range(stride):
                a = row[x - nch] if x >= nch else 0
                filt[x] = (row[x] - ((a + prev[x]) >> 1)) & 0xFF
        else:  # Paeth
            filt = row.copy()
            for x in range(stride):
                a = int(row[x - nch]) if x >= nch else 0
                c = int(prev[x - nch]) if x >= nch else 0
                up = int(prev[x])
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                filt[x] = (row[x] - pred) & 0xFF
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def plant_test_images_png(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic planted-PNG corpus for the PNG decode gate: per
    id, a (4 + id % 13) x (3 + id % 7) image whose SOURCE byte k is
    (id*31 + k) % 256 — RGB (color type 2) for even ids, RGBA (type
    6, alpha bytes dropped on decode) for odd ids — with the scanline
    filter cycling (id + y) % 5 so the corpus covers all five filter
    types. Closed-form in the id, so a SQL oracle can compute the
    decoded dimensions / means / position-weighted checksums while
    the Spark side must genuinely inflate + unfilter the container."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w, h = 4 + rid % 13, 3 + rid % 7
                ct = 2 if rid % 2 == 0 else 6
                nch = 3 if ct == 2 else 4
                k = np.arange(w * h * nch, dtype=np.int64)
                src = ((rid * 31 + k) % 256).astype(np.uint8).tobytes()
                payloads.append(
                    encode_png(w, h, src, color_type=ct, filter_seed=rid)
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    from ._util import spread

    return spread(df.select(id_col)).mapInPandas(_gen, schema=schema)


def plant_test_images(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic planted-image corpus for decode gates: per id,
    a (4 + id % 13) x (3 + id % 7) RGB image whose row-major byte k
    is (id*31 + k) % 256, encoded as PPM P6 for even ids and 24bpp
    bottom-up BMP for odd ids. Every value is closed-form in the id,
    so a SQL oracle can compute expected dimensions / means /
    position-weighted checksums without any image code — while the
    Spark side must genuinely parse two containers (including BMP's
    BGR order, stride padding, and bottom-up rows) to agree."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w, h = 4 + rid % 13, 3 + rid % 7
                k = np.arange(w * h * 3, dtype=np.int64)
                rgb = ((rid * 31 + k) % 256).astype(np.uint8).tobytes()
                payloads.append(
                    encode_ppm(w, h, rgb) if rid % 2 == 0 else encode_bmp(w, h, rgb)
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    from ._util import spread

    return spread(df.select(id_col)).mapInPandas(_gen, schema=schema)


def decode_image(
    df: DataFrame, payload_col: str = "payload", on_error: str = "raise"
) -> DataFrame:
    """Image decode through the Arrow-batched ``mapInPandas`` seam.
    REAL for the pure-Python-decodable containers — PPM (P6/P3) and
    uncompressed 24/32bpp BMP decode to row-major RGB bytes in the
    appended ``pixels`` column — and an explicit, contract-pinned
    stub (NotImplementedError) for every codec that needs PIL/cv2,
    exactly as the task brief prescribes. ``on_error='skip'`` yields
    NULL pixels for undecodable payloads instead of failing the job
    (the production posture for a corpus with corrupt/foreign files);
    the default ``'raise'`` keeps the stub contract observable."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                try:
                    if payload is None:
                        raise NotImplementedError(_CODEC_STUB_MSG)
                    out.append(_decode_payload(bytes(payload))[3])
                except NotImplementedError:
                    if on_error == "skip":
                        out.append(None)
                    else:
                        raise
            res = pdf.copy()
            res["pixels"] = out
            yield res

    schema = T.StructType(df.schema.fields + [T.StructField("pixels", T.BinaryType())])
    return df.mapInPandas(_decode, schema=schema)


def decode_image_stats(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Decode + per-image pixel statistics in ONE kernel pass —
    (id, width, height, channels, n_pixel_bytes, mean_byte, wsum) —
    never materializing decoded pixels into the shuffle. ``wsum`` is
    the position-weighted checksum sum((k+1) * byte_k) over the
    row-major RGB stream: order- and channel-sensitive, so a decoder
    that forgot BMP's bottom-up rows, BGR order, or stride padding
    fails the oracle even when the plain mean survives. Map-only
    (spread + mapInPandas), no shuffle — at 100 TB this is a linear
    scan of the payload column chunks."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                id_col: [], "width": [], "height": [], "channels": [],
                "n_pixel_bytes": [], "mean_byte": [], "wsum": [],
            }
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise NotImplementedError(_CODEC_STUB_MSG)
                    w, h, c, rgb = _decode_payload(bytes(payload))
                except NotImplementedError:
                    if on_error == "skip":
                        continue
                    raise
                arr = np.frombuffer(rgb, np.uint8).astype(np.int64)
                n = arr.size
                rows[id_col].append(rid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["n_pixel_bytes"].append(n)
                rows["mean_byte"].append(arr.sum() / n)
                rows["wsum"].append(int(((np.arange(n) + 1) * arr).sum()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_pixel_bytes", T.LongType()),
            T.StructField("mean_byte", T.DoubleType()),
            T.StructField("wsum", T.LongType()),
        ]
    )
    from ._util import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(_stats, schema=schema)


def resize_image(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    target_bytes: int = 256,
) -> DataFrame:
    """Deterministic fake 'resize': stride-sample the payload down to
    ``target_bytes`` (the byte-level analogue of nearest-neighbor
    downsampling). The Spark shape is the real one — binary in, binary
    out, Arrow-batched mapInPandas, metadata updated alongside the
    payload; swap the kernel for PIL's ``Image.resize`` when a codec
    is available."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None or len(payload) <= target_bytes:
                    out.append(payload)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, target_bytes).astype(np.int64)
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload_resized": out,
                    "n_bytes_resized": [len(p) if p is not None else 0 for p in out],
                }
            )

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("payload_resized", T.BinaryType()),
            T.StructField("n_bytes_resized", T.LongType()),
        ]
    )
    from ._util import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(_resize, schema=schema)


def extract_byte_features(
    df: DataFrame, id_col: str, payload_col: str = "payload", buckets: int = 16
) -> DataFrame:
    """Deterministic fake 'feature extraction': a normalized byte
    histogram per payload. Exercises the REAL production shape —
    binary column in, fixed-width float vector out, via Arrow-batched
    mapInPandas (bounded memory per batch, linear scale-out)."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None or len(payload) == 0:
                    feats.append([0.0] * buckets)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr // (256 // buckets), minlength=buckets)[:buckets]
                feats.append((hist / max(len(arr), 1)).astype(float).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    from ._util import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(_featurize, schema=schema)


def payload_simhash(
    df: DataFrame, id_col: str, payload_col: str = "payload", shingle_bytes: int = 4
) -> DataFrame:
    """(id, simhash bigint) over RAW payload bytes — genuinely
    codec-free near-dup sketching for media columns (no decode stub
    involved): shingle the byte stream into overlapping
    ``shingle_bytes``-grams and sign-of-sums their hashes, exactly
    the text simhash recipe (dedup.simhash_of_hashes) applied to
    bytes. Byte shingling is pure Catalyst: hex() doubles each byte
    into two chars, so byte k-grams are 2k-char substrings of the hex
    string, hashed JVM-side with xxhash64 — only the shared
    vectorized bit-vote kernel is Python (Arrow-batched).

    Re-encoded media won't byte-collide (that needs real decoding —
    see :func:`decode_image`), but exact and near-exact payloads
    (metadata edits, truncated tails, container re-muxes) land within
    a small Hamming distance — the cheap first pass a 100 TB media
    dedup runs before any codec work."""
    from . import dedup

    hx = F.hex(F.col(payload_col))
    width = 2 * shingle_bytes
    shingles = F.expr(
        f"transform(sequence(1, greatest(length({'_hx'}) - {width - 1}, 1), 2), "
        f"i -> substring(_hx, i, {width}))"
    )
    with_hx = df.select(F.col(id_col), hx.alias("_hx"))
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    return dedup.simhash_of_hashes(
        with_hx.select(F.col(id_col), hashes.alias("_h")), id_col, F.col("_h")
    )


def payload_near_duplicates(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_hamming: int = 3,
    blocks: int | None = None,
    exact_first: bool = True,
    clone_cap: int = 64,
) -> DataFrame:
    """Near-duplicate payload pairs (id_a, id_b, hamming) by byte
    simhash + the pigeonhole block join shared with the text path
    (dedup.sketch_candidates): any pair within ``max_hamming`` shares
    an exact block, so candidate generation is a bucketed equi-join —
    never all-pairs — and verification is one bit_count(XOR).

    ``exact_first`` (DEFAULT, the clone-group guard SCALING.md's sf1
    probe demanded): byte-identical payloads share every pigeonhole
    block, so a clone group of size g contributes g^2/2 pairs to the
    simhash join — 230 -> 228k pairs at sf1 was this exact blowup.
    The guard groups by an exact 64-bit payload digest FIRST:

    * exact groups of size <= ``clone_cap`` enumerate their full pair
      closure directly (hamming 0 by construction — no simhash work);
    * OVERSIZED groups star-link (min-id representative -> member):
      O(g) pairs whose connected component is provably identical —
      hamming-0 is a transitive equivalence, so the star keeps the
      clone class connected (same argument as minhash ``bucket_cap``;
      simhash's general star-linking unsoundness does NOT apply here
      because exact-digest equality IS transitive);
    * the simhash block join then runs on one REPRESENTATIVE per
      digest, so no clone group is ever re-exploded; cross-group near
      pairs surface between representatives.

    ``exact_first=False`` restores raw enumeration (the full pair set
    per clone group, quadratic in clone-group size — test/oracle
    use)."""
    from . import dedup

    if blocks is None:
        blocks = min(64, max_hamming + 1)
    assert blocks > max_hamming, "pigeonhole needs blocks > max_hamming"
    if not exact_first:
        sk = payload_simhash(df, id_col, payload_col)
        return dedup.sketch_candidates(
            dedup.explode_sketch(sk, id_col, blocks), id_col, max_hamming
        )
    ids = df.select(F.col(id_col), F.xxhash64(F.col(payload_col)).alias("_dg"))
    groups = ids.groupBy("_dg").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_rep")
    )
    members = ids.join(groups, on="_dg")
    small = members.where((F.col("_n") > 1) & (F.col("_n") <= clone_cap))
    exact_small = (
        small.select("_dg", F.col(id_col).alias("id_a"))
        .join(small.select("_dg", F.col(id_col).alias("id_b")), on="_dg")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    exact_large = members.where(
        (F.col("_n") > clone_cap) & (F.col(id_col) != F.col("_rep"))
    ).select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    exact_pairs = (
        exact_small.unionByName(exact_large)
        .withColumn("hamming", F.lit(0).cast("int"))
    )
    reps = df.join(
        groups.select(F.col("_rep").alias(id_col)), on=id_col, how="left_semi"
    )
    sk = payload_simhash(reps, id_col, payload_col)
    near = dedup.sketch_candidates(
        dedup.explode_sketch(sk, id_col, blocks), id_col, max_hamming
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    return exact_pairs.unionByName(near)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str = "payload", every_n_bytes: int = 64
) -> DataFrame:
    """Deterministic fake 'frame sampling': slice the payload at fixed
    strides (stand-in for video frame extraction; same explode shape a
    real sampler produces: one row per frame with frame_idx)."""
    n = F.octet_length(F.col(payload_col))
    idxs = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col(payload_col), (i * every_n_bytes + 1).cast("int"), every_n_bytes).alias(
                "frame_bytes"
            ),
        ),
    )
    return df.select(F.col(id_col), F.explode(frames).alias("f")).select(
        id_col, "f.frame_idx", "f.frame_bytes"
    )


# ---------------------------------------------------------------------------
# audio: real RIFF/WAVE PCM16 codec through the same stub-contract seam
# ---------------------------------------------------------------------------
def encode_wav(sample_rate: int, n_channels: int, pcm16: bytes) -> bytes:
    """Minimal RIFF/WAVE container around interleaved little-endian
    PCM16 samples (stdlib struct, no codec dependency) — the audio
    twin of :func:`encode_png` for planting test corpora."""
    import struct

    block = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block, block, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm16)) + pcm16
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(b: bytes) -> tuple[int, int, bytes]:
    """(sample_rate, n_channels, interleaved PCM16 bytes) from a
    RIFF/WAVE payload. REAL decode for uncompressed PCM16 (the format
    a crawl's .wav files overwhelmingly use); compressed codecs
    (MP3/AAC/FLAC, float or ADPCM WAV) raise the documented stub
    contract, same seam as JPEG in :func:`_decode_payload`."""
    import struct

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    rate = ch = bits = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            if sz < 16:
                raise NotImplementedError("malformed WAVE fmt chunk")
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if tag != 1:
                raise NotImplementedError(
                    f"compressed WAVE format tag {tag} is not supported "
                    "(PCM only; install an audio codec for the rest)"
                )
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise NotImplementedError("truncated WAVE payload")
    if bits != 16:
        raise NotImplementedError("only 16-bit PCM WAVE is supported")
    if len(data) % (2 * ch):
        raise NotImplementedError("truncated WAVE sample data")
    return rate, ch, data


def plant_test_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic per-id PCM16 waveforms in real WAV containers:
    ``n_frames = 50 + id % 97``, ``n_channels = 1 + id % 2`` (mono and
    stereo interleave both exercised), ``rate = 8000 + (id % 3) *
    4000``, interleaved sample k = ``((id*37 + k*k) % 4001) - 2000``.
    Closed-form, so the decode workload has an exact SQL oracle."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                rid = int(rid)
                nf = 50 + rid % 97
                ch = 1 + rid % 2
                rate = 8000 + (rid % 3) * 4000
                k = np.arange(nf * ch, dtype=np.int64)
                v = ((rid * 37 + k * k) % 4001) - 2000
                payloads.append(
                    encode_wav(rate, ch, v.astype("<i2").tobytes())
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    from ._util import spread

    return spread(df.select(id_col)).mapInPandas(_gen, schema=schema)


def decode_audio_stats(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Decode + per-clip sample statistics in ONE kernel pass — (id,
    sample_rate, n_channels, n_frames, sum_samples, wsum) — the audio
    twin of :func:`decode_image_stats`. ``wsum`` is the
    position-weighted checksum over the INTERLEAVED stream, so a
    decoder that mangled channel interleave, endianness, or chunk
    alignment fails the oracle even when the plain sum survives.
    Map-only (spread + mapInPandas), no shuffle; at 100 TB a linear
    scan of the payload column chunks."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                id_col: [], "sample_rate": [], "n_channels": [],
                "n_frames": [], "sum_samples": [], "wsum": [],
            }
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise NotImplementedError(_CODEC_STUB_MSG)
                    rate, ch, data = _decode_wav(bytes(payload))
                except NotImplementedError:
                    if on_error == "skip":
                        continue
                    raise
                arr = np.frombuffer(data, "<i2").astype(np.int64)
                rows[id_col].append(rid)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["n_frames"].append(arr.size // ch)
                rows["sum_samples"].append(int(arr.sum()))
                rows["wsum"].append(int(((np.arange(arr.size) + 1) * arr).sum()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("sum_samples", T.LongType()),
            T.StructField("wsum", T.LongType()),
        ]
    )
    from ._util import spread

    return spread(df.select(id_col, payload_col)).mapInPandas(_stats, schema=schema)
