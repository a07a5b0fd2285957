"""Dataset-prep utility tests (L6: setup_pad / setup_fetal / split_data)."""
import csv
import os

import numpy as np
from PIL import Image

from medmamba_tpu.utils.setup_fetal import setup_fetal
from medmamba_tpu.utils.setup_pad import setup_pad
from medmamba_tpu.utils.split_data import split_data


def _img(path):
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


def test_setup_pad(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    _img(img_dir / "PAT_1_2_3.png")
    _img(img_dir / "PAT_1_2_4.png")
    _img(img_dir / "PAT_9_1_1.png")
    _img(img_dir / "not_matching.png")
    with open(tmp_path / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["patient_id", "lesion_id", "diagnostic"])
        w.writeheader()
        w.writerow({"patient_id": "PAT_1", "lesion_id": "2",
                    "diagnostic": "NEV"})
        w.writerow({"patient_id": "PAT_9", "lesion_id": "1",
                    "diagnostic": "BCC"})
    out = setup_pad(str(tmp_path))
    assert sorted(os.listdir(out)) == ["BCC", "NEV"]
    assert len(os.listdir(os.path.join(out, "NEV"))) == 2
    assert len(os.listdir(os.path.join(out, "BCC"))) == 1
    assert (img_dir / "not_matching.png").exists()  # unmatched left in place


def test_setup_fetal(tmp_path):
    img_dir = tmp_path / "Images"
    img_dir.mkdir()
    _img(img_dir / "Patient01_Plane1_1of2.png")
    _img(img_dir / "Patient02_Plane3_1of1.png")
    _img(img_dir / "Patient02_Plane3_2of2.png")
    out = setup_fetal(str(tmp_path))
    assert sorted(os.listdir(out)) == ["Plane1", "Plane3"]
    assert len(os.listdir(os.path.join(out, "Plane3"))) == 2


def test_split_data_ratios_and_determinism(tmp_path):
    src = tmp_path / "src"
    for cls in ("a", "b"):
        (src / cls).mkdir(parents=True)
        for i in range(20):
            _img(src / cls / f"{i}.png")
    out1 = tmp_path / "out1"
    counts = split_data(str(src), str(out1), ratio=(0.6, 0.1, 0.3), seed=42)
    assert counts == {"train": 24, "val": 4, "test": 12}
    # per-class layout preserved
    assert sorted(os.listdir(out1 / "train")) == ["a", "b"]
    # deterministic with the same seed
    out2 = tmp_path / "out2"
    split_data(str(src), str(out2), ratio=(0.6, 0.1, 0.3), seed=42)
    for split in ("train", "val", "test"):
        for cls in ("a", "b"):
            assert (sorted(os.listdir(out1 / split / cls))
                    == sorted(os.listdir(out2 / split / cls)))
