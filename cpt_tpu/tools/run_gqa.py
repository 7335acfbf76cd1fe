"""GQA full-finetune driver (``ImageBertForSequenceClassification``, xe).

Mirrors reference ``Oscar/oscar/run_gqa.py`` (the basis of the forked
``fewshot/gqa_ft.py``): identical pipeline to VQA but hard-label
cross-entropy over the GQA answer vocabulary. Thin wrapper over
``run_vqa`` with GQA defaults.
"""
from __future__ import annotations

import sys

from cpt_tpu.tools.run_vqa import build_args, main as vqa_main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--loss_type" not in argv:
        argv += ["--loss_type", "xe"]
    if "--submission_format" not in argv:
        # GQA test-std rows: {"questionId": str, "prediction": str}
        # (reference run_gqa.py:696-703)
        argv += ["--submission_format", "gqa"]
    if "--test_name" not in argv:
        argv += ["--test_name", "submission"]
    return vqa_main(argv)


if __name__ == "__main__":
    main()
