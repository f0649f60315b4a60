"""Scale soak for the multimodal (binary-payload) stages (manual, not CI):

The text soaks prove the exchanges scale; this one proves the OPAQUE-
BINARY path does — large payload rows, actor-pool codec stages, small
batches. N MJPEG-in-AVI payloads (each a real RIFF container: 6
independent baseline JPEGs + an interleaved PCM16 auds stream) are
materialized ONCE to partitioned parquet (~6 KB/payload), then two
pipelines stream over them:

1. frames: FrameSampleStage(decoder="avi") samples 3 frames per doc
   (idx1 random access — the other 3 frames' bytes are never decoded)
   -> ImageFeatureStage over the PPM frames. Validated on exact
   integer aggregates (row count, width/height sums, frame-index sum)
   whose expected values are closed-form from the generator.
2. audio: AudioFeatureStage(decoder="avi") demuxes the PCM16 stream
   and extracts features. Validated on exact row count + duration sum
   and a tolerance check that per-doc RMS matches the sine family's
   analytic RMS (0.6^2/2 + 0.2^2/2)^0.5.

Both assert flat driver RSS: features/frames stay distributed; only
integer aggregates reach the driver.

Usage: python scripts/soak_media.py [frames|audio|all] [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_ROOT = "/tmp/oscar_ray_bench"
N_FRAMES_PER_DOC = 6
SAMPLED_FRAMES = 3
AUDIO_SECONDS = 0.25
AUDIO_RATE = 8000
W, H = 16, 12


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _media_dir(n_docs: int) -> str:
    """Materialize (doc_id, media) AVI payloads once, 64 parquet files.

    Generation is itself a distributed map over a doc_id range — the
    same shape a real ingest would have (payloads never transit the
    driver)."""
    out = os.path.join(CACHE_ROOT, f"media_avi_{n_docs}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import pyarrow as pa
    import ray.data

    def to_media(t: pa.Table) -> pa.Table:
        from oscar_ray.sources.synth import generate_avi

        payload = [generate_avi(int(d)) for d in t["doc_id"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "media": pa.array(payload, type=pa.binary())}
        )

    (
        ray.data.range(n_docs)
        .map_batches(lambda b: {"doc_id": b["id"]}, batch_format="numpy")
        .repartition(64)
        .map_batches(to_media, batch_format="pyarrow", batch_size=512)
        .write_parquet(out)
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _pool_size() -> int:
    """Half the cluster CPUs per actor pool: a pool sized >= the CPU
    count starves the upstream ReadParquet task (observed deadlock at
    8 cpus with a 16-actor pool holding every slot)."""
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)


def soak_frames(n_docs: int) -> dict:
    import ray.data
    from ray.data.aggregate import Count, Sum

    from oscar_ray.stages.multimodal import FrameSampleStage, ImageFeatureStage

    src = _media_dir(n_docs)
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    out = (
        ray.data.read_parquet(src)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "avi", "n_frames": SAMPLED_FRAMES},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=(1, _pool_size()),
        )
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={
                "decoder": "ppm",
                "dim": 8,
                "media_col": "frame",
                "passthrough_cols": ("frame_index",),
            },
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, _pool_size()),
        )
    )
    agg = out.aggregate(Count(), Sum("width"), Sum("height"), Sum("frame_index"))
    secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    n_rows = n_docs * SAMPLED_FRAMES
    assert int(agg["count()"]) == n_rows, agg
    assert int(agg["sum(width)"]) == n_rows * W
    assert int(agg["sum(height)"]) == n_rows * H
    # frame_index is 0..SAMPLED_FRAMES-1 per doc
    assert int(agg["sum(frame_index)"]) == n_docs * sum(range(SAMPLED_FRAMES))
    assert rss_growth < 800, f"driver RSS grew {rss_growth:.0f} MB"
    return {
        "docs": n_docs,
        "frame_rows": n_rows,
        "secs": round(secs, 1),
        "docs_per_sec": round(n_docs / secs, 1),
        "driver_rss_growth_mb": round(rss_growth, 1),
    }


def soak_audio(n_docs: int) -> dict:
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from oscar_ray.stages.multimodal import AudioFeatureStage

    src = _media_dir(n_docs)
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    out = ray.data.read_parquet(src).map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"decoder": "avi"},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, _pool_size()),
    )
    agg = out.aggregate(Count(), Sum("duration_s"), Min("rms"), Max("rms"))
    secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    assert int(agg["count()"]) == n_docs, agg
    assert abs(float(agg["sum(duration_s)"]) - n_docs * AUDIO_SECONDS) < 1e-6
    # the sine family's analytic RMS, PCM16+demux exact to ~1e-3
    expect_rms = (0.6**2 / 2 + 0.2**2 / 2) ** 0.5
    assert abs(float(agg["min(rms)"]) - expect_rms) < 5e-3, agg
    assert abs(float(agg["max(rms)"]) - expect_rms) < 5e-3, agg
    assert rss_growth < 800, f"driver RSS grew {rss_growth:.0f} MB"
    return {
        "docs": n_docs,
        "secs": round(secs, 1),
        "docs_per_sec": round(n_docs / secs, 1),
        "driver_rss_growth_mb": round(rss_growth, 1),
    }


def main():
    import ray

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    t0 = time.perf_counter()
    _media_dir(n)
    gen_secs = round(time.perf_counter() - t0, 1)
    out = {"generate_secs_first_run": gen_secs}
    if which in ("frames", "all"):
        out["frames"] = soak_frames(n)
    if which in ("audio", "all"):
        out["audio"] = soak_audio(n)
    print(json.dumps(out))
    rec = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "records",
        f"soak_media_{n}.json",
    )
    with open(rec, "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
