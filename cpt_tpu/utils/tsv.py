"""Seekable TSV + .lineidx IO.

Bit-compatible with the reference's TSV interchange format — the only
interface between the detector stage and the VL stage
(reference ``prompt_feat/maskrcnn_benchmark/structures/tsv_file.py`` and the
duplicate ``Oscar/oscar/utils/tsv_file.py``): a plain tab-separated file plus
a sibling ``<name>.lineidx`` containing one decimal byte-offset per row, so
row ``i`` can be read with a single seek.

Feature rows (written by the reference's
``engine/inference_ref.py:95-192``) are ``key \t json`` where the json embeds
base64-encoded little-endian float32 region features; `encode_features` /
`decode_features` reproduce that codec exactly.
"""
from __future__ import annotations

import base64
import os
import os.path as op
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def lineidx_path(tsv_path: str) -> str:
    return op.splitext(tsv_path)[0] + ".lineidx"


class TSVFile:
    """Random-access reader over a TSV file via its .lineidx sidecar.

    The lineidx is generated on first use if absent (the reference requires it
    to pre-exist; generating it keeps us drop-in compatible both ways).
    """

    def __init__(self, tsv_path: str, generate_lineidx: bool = True):
        self.tsv_path = tsv_path
        self.lineidx = lineidx_path(tsv_path)
        self._fp = None
        self._offsets: Optional[List[int]] = None
        if not op.isfile(self.lineidx) and generate_lineidx:
            _generate_lineidx(tsv_path, self.lineidx)

    def num_rows(self) -> int:
        self._ensure_offsets()
        return len(self._offsets)

    def __len__(self) -> int:
        return self.num_rows()

    def seek(self, idx: int) -> List[str]:
        self._ensure_offsets()
        if self._fp is None:
            self._fp = open(self.tsv_path, "rb")
        self._fp.seek(self._offsets[idx])
        return self._fp.readline().decode("utf-8").rstrip("\n").split("\t")

    def __getitem__(self, idx: int) -> List[str]:
        return self.seek(idx)

    def __iter__(self) -> Iterator[List[str]]:
        for i in range(len(self)):
            yield self.seek(i)

    def close(self) -> None:
        if self._fp is not None:
            self._fp.close()
            self._fp = None

    def _ensure_offsets(self) -> None:
        if self._offsets is None:
            with open(self.lineidx) as f:
                self._offsets = [int(line) for line in f if line.strip()]


def _generate_lineidx(tsv_path: str, idx_path: str) -> None:
    from cpt_tpu.utils import native

    offsets = native.scan_lineidx_native(tsv_path)
    if offsets is None:
        offsets = []
        with open(tsv_path, "rb") as f:
            pos = f.tell()
            while f.readline():
                offsets.append(pos)
                pos = f.tell()
    with open(idx_path, "w") as f:
        f.writelines(f"{o}\n" for o in offsets)


def tsv_writer(rows: Iterable[Sequence[str]], tsv_path: str) -> None:
    """Write rows + lineidx atomically (tmp file then rename), mirroring the
    reference's ``tsv_file_ops.tsv_writer`` semantics."""
    os.makedirs(op.dirname(op.abspath(tsv_path)), exist_ok=True)
    idx_path = lineidx_path(tsv_path)
    tsv_tmp, idx_tmp = tsv_path + ".tmp", idx_path + ".tmp"
    with open(tsv_tmp, "wb") as ftsv, open(idx_tmp, "w") as fidx:
        pos = 0
        for row in rows:
            line = "\t".join(str(c) for c in row) + "\n"
            data = line.encode("utf-8")
            ftsv.write(data)
            fidx.write(f"{pos}\n")
            pos += len(data)
    os.replace(tsv_tmp, tsv_path)
    os.replace(idx_tmp, idx_path)


def merge_tsv_shards(shard_paths: Sequence[str], out_path: str) -> None:
    """Concatenate per-host/per-shard TSVs into one file with a fresh lineidx.

    Replaces the reference's 15-shard ``tmp/cnt.pk`` loop
    (``prompt_feat/tools/cnt.py``, ``cmds/gqa/ext.sh``) with an explicit merge.
    """

    def rows():
        for p in shard_paths:
            with open(p, "rb") as f:
                for line in f:
                    yield line.decode("utf-8").rstrip("\n").split("\t")

    tsv_writer(rows(), out_path)


# --- feature codec -----------------------------------------------------------

def encode_feature(feat: np.ndarray) -> str:
    """float32 feature vector -> base64 string (reference codec)."""
    return base64.b64encode(np.ascontiguousarray(feat, dtype=np.float32).tobytes()).decode("utf-8")


def decode_feature(b64: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(b64), dtype=np.float32)


def encode_features(feats: np.ndarray) -> List[str]:
    return [encode_feature(f) for f in feats]


def decode_features(b64_list: Sequence[str]) -> np.ndarray:
    if len(b64_list) > 1:
        # uniform-length rows → batch-decode through the native codec
        first_len = len(b64_list[0])
        if all(len(b) == first_len for b in b64_list) and first_len % 4 == 0:
            from cpt_tpu.utils import native

            dim = (first_len // 4) * 3 // 4
            # base64 length → byte length is only exact without padding;
            # fall back to a reference decode of the first row for dim
            dim = decode_feature(b64_list[0]).shape[0]
            out = native.decode_features_native(b64_list, dim)
            if out is not None:
                return out
    return np.stack([decode_feature(b) for b in b64_list])
