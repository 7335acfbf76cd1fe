"""GQA pt+cpt logit-ensemble report.

Mirrors reference ``Oscar/eval/gqa/show_ensemble_results.py`` (+ the 3:1
weights from ``show.sh``): loads two ``val_results.pk`` pickles (prompt-
tuning and CPT runs), ensembles per-question score vectors as
``pt·w_pt + cpt·w_cpt``, and reports the ensembled accuracy against the
gt labels stored in the cpt pickle's results.
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np

from cpt_tpu.engine.evaluate import ensemble_logits


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt_results", required=True)
    p.add_argument("--cpt_results", required=True)
    p.add_argument("--labels", required=True,
                   help="json {q_id: answer label index}")
    p.add_argument("--pt_weight", type=float, default=3.0)
    p.add_argument("--cpt_weight", type=float, default=1.0)
    return p


def main(argv=None):
    import json

    args = build_args().parse_args(argv)
    pt = pickle.load(open(args.pt_results, "rb"))["results"]
    cpt = pickle.load(open(args.cpt_results, "rb"))["results"]
    labels = {str(k): int(v) for k, v in json.load(open(args.labels)).items()}

    n_correct, n_total = 0, 0
    for qid, lab in labels.items():
        if qid not in pt or qid not in cpt:
            continue
        ens = ensemble_logits(np.asarray(pt[qid]["scores"]),
                              np.asarray(cpt[qid]["scores"]),
                              args.pt_weight, args.cpt_weight)
        n_correct += int(int(np.argmax(ens)) == lab)
        n_total += 1
    acc = 100.0 * n_correct / max(n_total, 1)
    print(f"ensemble accuracy: {acc:.2f} ({n_total} questions)")
    return acc


if __name__ == "__main__":
    main()
