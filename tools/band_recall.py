"""Measure banded-LSH candidate recall vs the exact Hamming pair set
(r9 verdict task #3 / ADVICE #2 follow-up: the saturation-cap recall
caveat documented in ops/bandlsh.py becomes a NUMBER, per modality).

For each key built on ops.bandlsh.banded_dedup, computes:
  n_true           exact pairs at the key's hd threshold (all-pairs scan)
  recall           capped generator hits / n_true (the shipping path)
  recall_uncapped  band-scheme-only recall (isolates the cap's loss from
                   the intrinsic banding loss — hd_max >= N_BANDS pairs
                   can share no band)

Usage: python tools/band_recall.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line per modality plus a summary line for SCALE.md §21.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sim_spark.ops.bandlsh import band_recall
from sim_spark.scratch import release_tracked_caches
from sim_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from sim_spark.queries.multimodal_real import (
        bmp_dhash_sig,
        png_dhash_sig,
        wav_fingerprint_sig,
    )
    from sim_spark.queries.text_extras import simhash64_sig

    spark = get_spark("band_recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    modalities = [
        ("image_bmp_dhash", bmp_dhash_sig, dict(hd_max=4)),
        ("image_png_dhash", png_dhash_sig, dict(hd_max=4)),
        ("audio_wav_fingerprint", wav_fingerprint_sig, dict(hd_max=3, hd_mask=255)),
        # r11: the metric-banded dial (band_mask=hd_mask) — pigeonhole-
        # complete uncapped; see dedup_audio_fingerprint_metricband
        (
            "audio_wav_fp_metricband",
            wav_fingerprint_sig,
            dict(hd_max=3, hd_mask=255, band_mask=255),
        ),
        ("text_simhash64_tf", simhash64_sig, dict(hd_max=3)),
    ]
    rows = []
    for name, sig_fn, kw in modalities:
        t0 = time.time()
        r = band_recall(sig_fn(spark, SF_DIR), **kw)
        r["modality"] = name
        r["sf_dir"] = SF_DIR
        r["sec"] = round(time.time() - t0, 2)
        release_tracked_caches()
        print(json.dumps(r))
        rows.append(r)
    print(json.dumps({"summary": rows, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
