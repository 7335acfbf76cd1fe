"""Image-info / shard-count utilities.

Parity with two reference one-liners:

  * ``prompt_feat/tools/create_img_info.py`` — scan an image directory and
    write ``img_info.json`` ({basename: {width, height}}), consumed by the
    extraction datasets' yaml descriptors.
  * ``prompt_feat/tools/cnt.py`` — persist the shard count for the
    extraction driver scripts (``tmp/cnt.pk``).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
from typing import List, Optional


def create_img_info(image_dir: str, output: Optional[str] = None,
                    exts: tuple = ("*.jpg", "*.jpeg", "*.png")) -> dict:
    from PIL import Image

    infos = {}
    for pat in exts:
        for fname in sorted(glob.glob(os.path.join(image_dir, pat))):
            with Image.open(fname) as img:
                w, h = img.size
            infos[os.path.basename(fname)] = {"width": w, "height": h}
    if output is None:
        output = os.path.join(os.path.dirname(image_dir.rstrip("/")),
                              "img_info.json")
    with open(output, "w") as f:
        json.dump(infos, f)
    return infos


def write_shard_count(count: int, path: str = "tmp/cnt.pk") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(int(count), f)


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--shard_count", type=int, default=None,
                   help="also persist the shard count (cnt.py parity)")
    p.add_argument("--cnt_path", default="tmp/cnt.pk")
    args = p.parse_args(argv)
    infos = create_img_info(args.image_dir, args.output)
    print(f"wrote info for {len(infos)} images")
    if args.shard_count is not None:
        write_shard_count(args.shard_count, args.cnt_path)
    return infos


if __name__ == "__main__":
    main()
