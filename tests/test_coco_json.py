"""COCO-json / VOC-XML → vg-TSV bridge (reference
``maskrcnn_benchmark/data/datasets/coco.py``, ``voc.py`` semantics)."""
import json
import os

import numpy as np
import pytest

from cpt_tpu.data.coco_json import (load_coco_json, load_voc_xml,
                                    coco_to_tsv, voc_to_tsv)


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    from PIL import Image

    yy, xx = np.mgrid[0:96, 0:128]
    for i, name in enumerate(["a.jpg", "b.jpg", "c.jpg", "d.jpg"]):
        arr = np.stack([(yy * 2 + i * 10) % 256, (xx * 2) % 256,
                        ((yy + xx) // 2) % 256], -1).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / name)
    ann = {
        # ids intentionally unsorted: loader must sort (coco.py:45)
        "images": [
            {"id": 7, "file_name": "b.jpg", "width": 128, "height": 96},
            {"id": 3, "file_name": "a.jpg", "width": 128, "height": 96},
            {"id": 9, "file_name": "c.jpg", "width": 128, "height": 96},
            {"id": 11, "file_name": "d.jpg", "width": 128, "height": 96},
        ],
        # category ids sparse + unsorted: contiguous mapping in ascending
        # id order (coco.py:59-61)
        "categories": [{"id": 18, "name": "dog"}, {"id": 2, "name": "cat"},
                       {"id": 44, "name": "car"}],
        "annotations": [
            {"image_id": 3, "category_id": 2, "bbox": [4, 4, 37, 37],
             "iscrowd": 0},
            {"image_id": 3, "category_id": 18, "bbox": [30, 10, 61, 71],
             "iscrowd": 0},
            # crowd: filtered from targets but keeps the image valid
            {"image_id": 7, "category_id": 44, "bbox": [0, 0, 50, 50],
             "iscrowd": 1},
            # degenerate-only image: dropped (coco.py:18-22)
            {"image_id": 9, "category_id": 2, "bbox": [5, 5, 1, 30],
             "iscrowd": 0},
            # box exceeding the image: clipped to inclusive bounds
            {"image_id": 11, "category_id": 44, "bbox": [100, 60, 60, 60],
             "iscrowd": 0},
        ],
        # image 11 has... (no annotation for some images is fine)
    }
    ann_file = root / "instances.json"
    json.dump(ann, open(ann_file, "w"))
    return root, str(ann_file), str(img_dir)


def test_load_coco_json_semantics(coco_fixture):
    _, ann_file, _ = coco_fixture
    images, targets, labelmap = load_coco_json(ann_file)
    # sorted ids; id 9 (degenerate-only) dropped; 3, 7, 11 kept
    assert [im["id"] for im in images] == [3, 7, 11]
    # contiguous 1-based mapping in ascending category-id order
    assert labelmap["label_to_idx"] == {"cat": 1, "dog": 2, "car": 3}
    objs = targets[3]["objects"]
    assert [o["class"] for o in objs] == ["cat", "dog"]
    # xywh → inclusive xyxy: x2 = x + w - 1
    assert objs[0]["rect"] == [4, 4, 40, 40]
    assert objs[1]["rect"] == [30, 10, 90, 80]
    # crowd filtered out of the kept image's objects
    assert targets[7]["objects"] == []
    # clip to image: 128x96 → max inclusive (127, 95)
    assert targets[11]["objects"][0]["rect"] == [100, 60, 127, 95]


def test_coco_to_tsv_loads_as_detection_dataset(coco_fixture, tmp_path):
    _, ann_file, img_dir = coco_fixture
    from cpt_tpu.data.vg_tsv import DetectionTSVDataset

    yaml_path = coco_to_tsv(ann_file, img_dir, str(tmp_path / "tsv"))
    ds = DetectionTSVDataset(yaml_path)
    assert len(ds) == 3
    assert ds.get_img_key(0) == "3"
    t = ds.get_target(0)
    np.testing.assert_array_equal(t["labels"], [1, 2])
    np.testing.assert_allclose(t["boxes"][0], [4, 4, 40, 40])
    assert ds.get_image(0).shape == (96, 128, 3)


def test_voc_xml_and_to_tsv(tmp_path):
    from PIL import Image

    root = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(root / sub)
    xml = """<annotation><size><width>64</width><height>48</height></size>
      <object><name>Dog</name><difficult>0</difficult>
        <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>30</xmax><ymax>40</ymax>
        </bndbox></object>
      <object><name>person</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax>
        </bndbox></object></annotation>"""
    (root / "Annotations" / "x1.xml").write_text(xml)
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
        root / "JPEGImages" / "x1.jpg")
    (root / "ImageSets" / "Main" / "test.txt").write_text("x1\n")

    objs = load_voc_xml(str(root / "Annotations" / "x1.xml"))
    # 1-based pixel coords → 0-based inclusive (voc.py:86-92); class
    # lower-cased
    assert objs[0] == {"rect": [4.0, 5.0, 29.0, 39.0], "class": "dog",
                      "difficult": 0}
    assert objs[1]["difficult"] == 1

    from cpt_tpu.data.vg_tsv import DetectionTSVDataset

    yaml_path = voc_to_tsv(str(root), "test", str(tmp_path / "tsv"))
    ds = DetectionTSVDataset(yaml_path)
    assert len(ds) == 1
    t = ds.get_target(0)
    assert t["labels"][0] == ds.class_to_ind["dog"]


@pytest.mark.slow
def test_coco_bridge_end_to_end_detector_eval(coco_fixture, tmp_path):
    """convert_dataset coco → test_detector --tsv --coco_eval runs
    COCO-protocol mAP on the bridged fixture (VERDICT r2 ask #5)."""
    _, ann_file, img_dir = coco_fixture
    from cpt_tpu.tools.convert_dataset import main as convert_main
    from cpt_tpu.tools.test_detector import main as test_main

    yaml_path = convert_main(["coco", "--ann", ann_file,
                              "--img_dir", img_dir,
                              "--out", str(tmp_path / "tsv")])
    ok = test_main(["--tsv", yaml_path, "--tiny", "--dtype", "float32",
                    "--coco_eval", "--output", str(tmp_path / "eval.pk")])
    assert ok
