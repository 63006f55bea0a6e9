"""Deterministic shard assignment for tests/run_shards.sh.

Greedy longest-processing-time bin-pack of the test files into N shards
over a static per-file cost table. The weights are COARSE estimates
(seconds-ish on this 1-core host, derived from the round-5 full-proof
shard walls at N=8 and N=10); they exist to keep the known-heavy files in
different shards — plain round-robin stacked several of them into one
891 s shard while others idled at ~200 s. Unlisted files default to
DEFAULT_W; new heavy files should get a row here when a proof run shows a
shard running long.

Usage: python tests/shard_weights.py N   -> N lines, each a shard's
space-separated file list (possibly empty). Deterministic in N: sorted
file list, stable weight sort, first-minimal-bin tie-break.
"""

import glob
import os
import sys

DEFAULT_W = 25

WEIGHTS = {
    # e2e CLI / subprocess suites
    "test_reference_e2e_parity.py": 170,
    "test_cli.py": 140,
    "test_cli_early.py": 140,
    "test_serve.py": 160,
    "test_multiprocess.py": 130,
    "test_preemption.py": 60,
    # pipeline-parallel / mesh programs (8-device CPU meshes, big compiles)
    "test_pp_lxmert.py": 230,
    "test_pp_text.py": 150,
    "test_pipeline.py": 120,
    "test_pp_dropout_exact.py": 110,
    "test_mesh.py": 80,
    "test_mesh_chunked.py": 60,
    # flagship-model compile-heavy suites
    "test_graft_entry.py": 230,
    "test_models_parity.py": 190,
    "test_early_parity.py": 140,
    "test_dual_parity.py": 100,
    "test_learning.py": 110,
    "test_train_many.py": 80,
    "test_scan_and_mmbt.py": 120,
    "test_mmbt.py": 140,
    "test_attn_block.py": 120,
    "test_attention.py": 90,
    "test_tim_batched.py": 90,
    "test_tim_reuse.py": 80,
    "test_ensemble.py": 90,
    "test_grid.py": 90,
    "test_frcnn.py": 120,
    "test_frcnn_ingest.py": 80,
    "test_export.py": 80,
    "test_checkpoint.py": 70,
    "test_beit_parity.py": 80,
    "test_deit_convatt.py": 80,
    "test_cnn_paths.py": 80,
    "test_vilt_exact.py": 70,
    "test_steps.py": 70,
    "test_bucketing.py": 60,
    "test_remat_savedfeat_freeze.py": 90,
}


def assign(n):
    files = sorted(glob.glob(os.path.join("tests", "test_*.py")))
    order = sorted(files,
                   key=lambda f: (-WEIGHTS.get(os.path.basename(f),
                                               DEFAULT_W), f))
    bins = [[0, []] for _ in range(n)]
    for f in order:
        b = min(bins, key=lambda b: b[0])  # first minimal bin (stable)
        b[0] += WEIGHTS.get(os.path.basename(f), DEFAULT_W)
        b[1].append(f)
    return [sorted(b[1]) for b in bins]


if __name__ == "__main__":
    for shard in assign(int(sys.argv[1])):
        print(" ".join(shard))
