"""WARC / WET source + sink (sources/warc.py).

The Common-Crawl container path: writer determinism, record round
trips (plain + per-record gzip members), envelope gates, and the
end-to-end claim — a directory of ``.warc.gz`` shards builds the SAME
postings/dict artifacts as the equivalent parquet pages table.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oscar_ray.sources.synth import generate_pages_batch
from oscar_ray.sources.warc import (
    parse_warc,
    parse_wet,
    read_warc_file,
    warc_write,
    wet_write,
)


def _pages(n=80, start=0):
    return generate_pages_batch(start, n, seed=42)


class TestWarcRoundTrip:
    def test_response_roundtrip_plain_and_gzip(self, tmp_path):
        tbl = _pages(60)
        for name in ("a.warc", "a.warc.gz"):
            path = str(tmp_path / name)
            n = warc_write(path, tbl)
            assert n == 60
            got = read_warc_file(path)
            assert got["url"].to_pylist() == tbl["url"].to_pylist()
            assert got["html"].to_pylist() == tbl["html"].to_pylist()
            assert got["lang"].to_pylist() == tbl["lang"].to_pylist()
            assert (
                got["warc_ts"].cast(pa.int64()).to_pylist()
                == tbl["warc_ts"].cast(pa.int64()).to_pylist()
            )

    def test_extracted_text_byte_identical(self, tmp_path):
        """The input_hint invariant survives the container: html read
        back from WARC extracts byte-identical text."""
        from oscar_ray.spec.extract import extract_text

        tbl = _pages(50)
        path = str(tmp_path / "b.warc.gz")
        warc_write(path, tbl)
        got = read_warc_file(path)
        texts = [extract_text(h) for h in got["html"].to_pylist()]
        assert texts == tbl["text"].to_pylist()

    def test_writer_bytes_deterministic(self, tmp_path):
        tbl = _pages(20)
        d1, d2 = tmp_path / "r1", tmp_path / "r2"
        d1.mkdir()
        d2.mkdir()
        p1, p2 = str(d1 / "x.warc.gz"), str(d2 / "x.warc.gz")
        warc_write(p1, tbl)
        warc_write(p2, tbl)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_wet_roundtrip_unicode_and_empty(self, tmp_path):
        tbl = pa.table(
            {
                "url": ["https://a/1", "https://b/2", "https://c/3"],
                "warc_ts": pa.array([0, 1_500_000, 2**40], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "text": ["héllo wörld\n\nzwei", "", "tab\tand <p>raw</p> & amp"],
                "lang": ["de", "und", "en"],
            }
        )
        path = str(tmp_path / "c.wet.gz")
        assert wet_write(path, tbl) == 3
        got = read_warc_file(path)
        assert got["text"].to_pylist() == tbl["text"].to_pylist()
        assert got["url"].to_pylist() == tbl["url"].to_pylist()
        assert got["lang"].to_pylist() == tbl["lang"].to_pylist()
        assert (
            got["warc_ts"].cast(pa.int64()).to_pylist()
            == tbl["warc_ts"].cast(pa.int64()).to_pylist()
        )

    def test_non_payload_records_skipped(self, tmp_path):
        """warcinfo heads every file; conversion records are invisible
        to parse_warc and response records to parse_wet."""
        tbl = _pages(5)
        wpath, tpath = str(tmp_path / "d.warc"), str(tmp_path / "d.wet")
        warc_write(wpath, tbl)
        wet_write(tpath, tbl)
        raw = open(wpath, "rb").read() + open(tpath, "rb").read()
        assert len(parse_warc(raw)) == 5
        assert len(parse_wet(raw)) == 5


class TestWarcEnvelope:
    def test_truncated_block_raises(self, tmp_path):
        path = str(tmp_path / "t.warc")
        warc_write(path, _pages(3), record_gzip=False)
        data = open(path, "rb").read()
        with pytest.raises(ValueError, match="truncated"):
            parse_warc(data[: len(data) - 40])

    def test_garbage_between_records_raises(self):
        with pytest.raises(ValueError, match="expected record header"):
            list(parse_warc(b"NOT A WARC"))

    def test_chunked_http_gated(self):
        block = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n"
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:0>\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"WARC-Target-URI: https://x/\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"
        )
        with pytest.raises(ValueError, match="chunked"):
            parse_warc(rec)

    def test_missing_content_length_raises(self):
        rec = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc(rec)

    def test_resource_record_raw_payload(self):
        """WARC-Type: resource carries the capture without an HTTP
        envelope — payload comes back verbatim."""
        body = b"<html><body><p>raw</p></body></html>"
        rec = (
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"WARC-Date: 2026-01-02T03:04:05.000042Z\r\n"
            b"WARC-Target-URI: https://y/r\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
        )
        got = parse_warc(rec)
        assert got["html"].to_pylist() == [body]
        assert got["warc_ts"].cast(pa.int64()).to_pylist()[0] % 1_000_000 == 42


class TestWarcBuild:
    def test_warc_source_identical_index(self, ray_session, tmp_path):
        """A dir of .warc.gz shards builds byte-identical postings/dict
        artifacts to the equivalent parquet pages table (the jsonl
        fragment-granularity invariance test, extended to WARC)."""
        from oscar_ray.index.build import IndexBuildConfig, build_index

        tbl = _pages(120)
        pdir, wdir = str(tmp_path / "pq"), str(tmp_path / "wa")
        os.makedirs(pdir)
        os.makedirs(wdir)
        pq.write_table(tbl, os.path.join(pdir, "a.parquet"), row_group_size=60)
        warc_write(os.path.join(wdir, "shard-0000.warc.gz"), tbl.slice(0, 60))
        warc_write(os.path.join(wdir, "shard-0001.warc.gz"), tbl.slice(60, 60))
        cfg_p = IndexBuildConfig(num_partitions=4, shard_fragments=2)
        cfg_w = IndexBuildConfig(
            num_partitions=4, shard_fragments=2, extract_from_html=True
        )
        out_p, out_w = str(tmp_path / "ip"), str(tmp_path / "iw")
        build_index(pdir, out_p, cfg_p)
        build_index(wdir, out_w, cfg_w)

        def arts(d):
            return {
                os.path.relpath(p, d): hashlib.sha256(open(p, "rb").read()).hexdigest()
                for sub in ("postings", "dict")
                for p in sorted(
                    glob.glob(os.path.join(d, sub, "**", "*.parquet"), recursive=True)
                )
            }

        hp, hw = arts(out_p), arts(out_w)
        assert hp == hw and len(hp) > 0

    def test_list_fragments_counts(self, tmp_path):
        from oscar_ray.sources.pages import list_fragments

        wdir = str(tmp_path / "frag")
        os.makedirs(wdir)
        warc_write(os.path.join(wdir, "s0.warc.gz"), _pages(30))
        wet_write(os.path.join(wdir, "s1.wet.gz"), _pages(12, start=30))
        frags = list_fragments(wdir)
        assert [(f.num_rows, f.base_docid) for f in frags] == [(30, 0), (12, 30)]
