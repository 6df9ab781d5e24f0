"""Y4M video codec + frame_sample real path, and the Iceberg catalog
recorded-call double (exercises the writeTo DSL without the runtime jar —
only the Py4J surface itself stays untested in-sandbox)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from liken_spark.sources.video import y4m_decode, y4m_encode, y4m_frame_offsets


def _gradient_frames(n=10, h=16, w=24):
    """Deterministic RGB frames: per-frame shifted gradients."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack(
        [
            np.stack([(xx * 8 + k * 17) % 256, (yy * 8 + k * 5) % 256, (xx + yy + k) % 256], axis=-1)
            for k in range(n)
        ]
    ).astype(np.uint8)
    return frames


def test_y4m_mono_roundtrip_exact():
    frames = (_gradient_frames(6, 8, 12)[..., 0]).copy()  # (n, h, w) gray
    raw = y4m_encode(frames)
    idx, out = y4m_decode(raw)
    assert idx == list(range(6))
    # Cmono round-trips bit-exactly; decode replicates gray into RGB
    assert np.array_equal(out[..., 0], frames)
    assert np.array_equal(out[..., 1], frames)


def test_y4m_c444_roundtrip_close():
    frames = _gradient_frames(4)
    idx, out = y4m_decode(y4m_encode(frames))
    assert idx == [0, 1, 2, 3]
    assert out.shape == frames.shape
    # YUV quantization: every channel within a few counts
    assert int(np.abs(out.astype(int) - frames.astype(int)).max()) <= 4


def test_y4m_every_n_touches_only_sampled_frames():
    frames = _gradient_frames(10)
    raw = y4m_encode(frames)
    idx, out = y4m_decode(raw, every_n=3)
    assert idx == [0, 3, 6, 9]
    full_idx, full = y4m_decode(raw)
    assert np.array_equal(out, full[[0, 3, 6, 9]])


def test_y4m_c420_and_frame_params():
    """C420 default colorspace (no C tag) + FRAME lines carrying params —
    both allowed by the spec and handled by the offset scan."""
    h, w = 8, 8
    y = np.full((h, w), 120, np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    body = y.tobytes() + u.tobytes() + v.tobytes()
    raw = b"YUV4MPEG2 W8 H8 F25:1\n" + b"FRAME Xparam\n" + body + b"FRAME\n" + body
    ww, hh, cs, offs = y4m_frame_offsets(raw)
    assert (ww, hh, cs) == (8, 8, "C420")
    assert len(offs) == 2
    idx, out = y4m_decode(raw)
    # neutral chroma: RGB == Y everywhere
    assert np.all(out == 120)


def test_y4m_rejects_non_y4m():
    with pytest.raises(ValueError, match="not a Y4M"):
        y4m_decode(b"RIFFxxxx")


def test_frame_sample_y4m_golden(spark):
    """frame_sample decodes planted Y4M clips in a mapInArrow pass; the
    emitted BMP frames hash-match a direct driver-side decode."""
    from liken_spark.operators.multimodal import frame_sample
    from liken_spark.sources.image import bmp_encode

    frames = _gradient_frames(10)
    raw = y4m_encode(frames)
    df = spark.createDataFrame([("v0", raw), ("v1", raw)], "video_id string, bytes binary")
    rows = frame_sample(df, every_n=3).collect()
    assert sorted((r["video_id"], r["frame_idx"]) for r in rows) == [
        (v, i) for v in ("v0", "v1") for i in (0, 3, 6, 9)
    ]
    _, decoded = y4m_decode(raw, every_n=3)
    expect = {
        i: hashlib.sha1(bmp_encode(np.ascontiguousarray(decoded[k]))).hexdigest()
        for k, i in enumerate((0, 3, 6, 9))
    }
    for r in rows:
        assert hashlib.sha1(bytes(r["frame_bytes"])).hexdigest() == expect[r["frame_idx"]]


# ---------------------------------------------------------------------------
# Iceberg catalog: recorded-call doubles (no runtime jar in this sandbox)


class _FakeWriterV2:
    def __init__(self, log):
        self.log = log

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", tuple(str(c) for c in cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


class _FakeDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        self.log.append(("writeTo", ident))
        return _FakeWriterV2(self.log)


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def table(self, ident):
        self.log.append(("read.table", ident))
        return "df-sentinel"


class _FakeCatalogAPI:
    def __init__(self, log):
        self.log = log

    def tableExists(self, ident):
        self.log.append(("tableExists", ident))
        return True


class _FakeSpark:
    def __init__(self):
        self.log = []
        self.read = _FakeReader(self.log)
        self.catalog = _FakeCatalogAPI(self.log)

    def sql(self, q):
        self.log.append(("sql", q))


def test_iceberg_catalog_write_records_exact_dsl_chain(spark):
    # spark fixture: IcebergCatalog.write builds F.col partition columns,
    # which needs an active session even against the call double
    from liken_spark.sources.catalog import IcebergCatalog

    fake = _FakeSpark()
    cat = IcebergCatalog(fake, "lake", namespace="liken")
    cat.write("clips", _FakeDF(fake.log), partition_by=["lang"])
    assert fake.log[0] == ("sql", "CREATE NAMESPACE IF NOT EXISTS lake.liken")
    assert fake.log[1] == ("writeTo", "lake.liken.clips")
    assert fake.log[2][0] == "partitionedBy" and "lang" in fake.log[2][1][0]
    assert fake.log[3] == ("createOrReplace",)


def test_iceberg_catalog_write_unpartitioned_skips_partitionedBy():
    from liken_spark.sources.catalog import IcebergCatalog

    fake = _FakeSpark()
    IcebergCatalog(fake, "lake").write("t", _FakeDF(fake.log))
    assert [e[0] for e in fake.log] == ["sql", "writeTo", "createOrReplace"]


def test_iceberg_catalog_read_and_exists_identifiers():
    from liken_spark.sources.catalog import IcebergCatalog

    fake = _FakeSpark()
    cat = IcebergCatalog(fake, "lake", namespace="ns")
    assert cat.read("t") == "df-sentinel"
    assert cat.exists("t") is True
    assert ("read.table", "lake.ns.t") in fake.log
    assert ("tableExists", "lake.ns.t") in fake.log


def test_resolve_catalog_picks_iceberg_when_catalog_conf_set():
    from liken_spark.sources.catalog import IcebergCatalog, resolve_catalog

    class _Conf:
        def get(self, key, default=None):
            assert key == "spark.sql.catalog.lake"
            return "org.apache.iceberg.spark.SparkCatalog"

    class _SparkWithConf(_FakeSpark):
        conf = _Conf()

    cat = resolve_catalog(_SparkWithConf(), "lake")
    assert isinstance(cat, IcebergCatalog)
    assert cat.catalog == "lake"
