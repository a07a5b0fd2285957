"""CLI-surface tests (argparse semantics; no device work)."""
import numpy as np

from medmamba_tpu.cli.train import parse_args as train_args
from medmamba_tpu.cli.test import parse_args as gradcam_args
from medmamba_tpu.cli.evaluate import parse_args as eval_args
from medmamba_tpu.data.datasets import is_npz_dir


def test_train_flag_surface_matches_reference():
    """All reference train.py flags (train.py:38-55) parse with same defaults."""
    a = train_args(["--train_dir", "/t", "--val_dir", "/v"])
    assert a.medmb_size == "T"
    assert a.num_classes is None
    assert a.model_name == "Medmamba"
    assert a.batch_size is None and a.epochs is None and a.lr is None
    assert a.resume is None
    assert a.patience == 25
    assert a.save_dir == "."
    assert a.seed == 42
    assert a.augmentation is False
    assert a.use_early_stopping is False
    assert a.attn_drop_rate == 0.0


def test_train_flag_overrides():
    a = train_args(["--train_dir", "/t", "--val_dir", "/v",
                    "--medmb_size", "B", "--batch_size", "32",
                    "--epochs", "7", "--lr", "0.01", "--augmentation",
                    "--use_early_stopping", "--attn_drop_rate", "0.1",
                    "--dtype", "bfloat16", "--scan_impl", "assoc"])
    assert (a.medmb_size, a.batch_size, a.epochs, a.lr) == ("B", 32, 7, 0.01)
    assert a.augmentation and a.use_early_stopping
    assert a.attn_drop_rate == 0.1
    assert a.dtype == "bfloat16" and a.scan_impl == "assoc"


def test_test_cli_flags():
    a = gradcam_args(["--checkpoint_path", "/c", "--test_dir", "/d",
                   "--num_classes", "9"])
    assert a.output_dir == "gradcam_outputs" and a.num_images == 10


def test_evaluate_cli_flags():
    a = eval_args(["--checkpoint_path", "/c", "--data_dir", "/d"])
    assert a.split == "test" and a.batch_size == 64


def test_npz_autodetection(tmp_path):
    assert not is_npz_dir(str(tmp_path), "train")
    np.save(tmp_path / "train_images.npy", np.zeros((2, 4, 4), np.uint8))
    assert not is_npz_dir(str(tmp_path), "train")  # labels missing
    np.save(tmp_path / "train_labels.npy", np.zeros((2, 1), np.int64))
    assert is_npz_dir(str(tmp_path), "train")
    assert not is_npz_dir(str(tmp_path), "val")


def test_serving_scan_tau_flags():
    """evaluate/demo expose the same --scan_tau dial as train (round-3
    serving-side tau selection); default auto, numbers force."""
    from medmamba_tpu.cli.demo import parse_args as demo_args

    a = eval_args(["--checkpoint_path", "/c", "--data_dir", "/d"])
    assert a.scan_tau == "auto"
    a = eval_args(["--checkpoint_path", "/c", "--data_dir", "/d",
                   "--scan_tau", "128"])
    assert a.scan_tau == "128"
    d = demo_args(["--checkpoint_path", "/c"])
    assert d.scan_tau == "auto"
    d = demo_args(["--checkpoint_path", "/c", "--scan_tau", "64"])
    assert d.scan_tau == "64"


def test_train_cli_imagefolder_end_to_end(tmp_path):
    """Full train CLI run in ImageFolder mode (the round-5 A/B surfaced an
    ImageFolder-only best-checkpoint crash that NPZ-only e2e coverage
    missed): tiny PNG class tree, 1 epoch, seq impl on CPU, then the saved
    best checkpoint restores with the idx->name class_indices intact."""
    from PIL import Image

    from medmamba_tpu.cli.train import main as train_main
    from medmamba_tpu.train.checkpoint import restore_params

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for c in ("class_a", "class_b"):
            d = tmp_path / split / c
            d.mkdir(parents=True)
            for i in range(8):
                arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

    save = tmp_path / "run"
    train_main(["--train_dir", str(tmp_path / "train"),
                "--val_dir", str(tmp_path / "val"),
                "--epochs", "1", "--batch_size", "8", "--image_size", "16",
                "--scan_impl", "seq", "--log_every", "0",
                "--save_dir", str(save)])
    best = [p for p in save.iterdir() if p.name.endswith("_best")]
    assert best, list(save.iterdir())
    _, meta = restore_params(str(best[0]))
    assert meta["class_indices"] == {"0": "class_a", "1": "class_b"}
