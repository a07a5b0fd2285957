"""Multi-host data-path tests (VERDICT r3 #6; SURVEY §2.7 DCN axis).

A real pod runs one process per host; this environment is single-process, so
these tests pin the per-process SLICING contract (pure host logic) and the
process_count==1 assembly path of ``shard_batch``. The contract: every
process builds the same seeded global shuffle, yields its contiguous
1/process_count slice of each global batch, and
``jax.make_array_from_process_local_data`` reassembles the global array --
so a pod run needs no code changes, only N processes.
"""
import numpy as np
import pytest

from medmamba_tpu.data.loader import BatchLoader


class _ArrayDS:
    def __init__(self, n, img_shape=(4, 4, 3)):
        self.images = (np.arange(n)[:, None, None, None]
                       * np.ones((n,) + img_shape)).astype(np.uint8)
        self.labels = np.arange(n, dtype=np.int64)

    def __len__(self):
        return len(self.images)

    def get_batch(self, idx):
        return self.images[idx], self.labels[idx]


@pytest.mark.parametrize("n,batch", [(37, 8), (32, 8), (5, 8)])
def test_process_slices_concatenate_to_global_batch(n, batch):
    """Concatenating every process's slice reproduces the single-process
    batch exactly -- including the padded final batch (label -1 rows)."""
    ds = _ArrayDS(n)
    pc = 4
    single = BatchLoader(ds, batch, shuffle=True, seed=7)
    multi = [BatchLoader(ds, batch, shuffle=True, seed=7,
                         process_index=pi, process_count=pc)
             for pi in range(pc)]
    for epoch in (0, 1):
        batches_s = list(single.epoch(epoch))
        batches_m = [list(m.epoch(epoch)) for m in multi]
        assert all(len(bm) == len(batches_s) for bm in batches_m)
        for i, (img_s, lbl_s) in enumerate(batches_s):
            img_cat = np.concatenate([batches_m[pi][i][0]
                                      for pi in range(pc)], 0)
            lbl_cat = np.concatenate([batches_m[pi][i][1]
                                      for pi in range(pc)], 0)
            assert img_cat.shape == img_s.shape
            # label rows must agree exactly (real + padded -1 rows)
            np.testing.assert_array_equal(lbl_cat, lbl_s)
            # real image rows must agree exactly; padded rows may repeat a
            # different (process-local) source row -- they carry label -1
            # and contribute zero gradient either way
            real = lbl_s >= 0
            np.testing.assert_array_equal(img_cat[real], img_s[real])


def test_all_padding_slice_is_masked():
    """A process whose entire slice of the final batch is padding still
    yields a full-shape batch with every label -1."""
    ds = _ArrayDS(9)  # batch 8, pc 4 -> final global batch has 1 real row
    loaders = [BatchLoader(ds, 8, shuffle=False, process_index=pi,
                           process_count=4) for pi in range(4)]
    finals = [list(ld.epoch(0))[-1] for ld in loaders]
    for pi, (img, lbl) in enumerate(finals):
        assert img.shape[0] == 2
        if pi == 0:
            np.testing.assert_array_equal(lbl, [8, -1])
        else:
            np.testing.assert_array_equal(lbl, [-1, -1])


def test_multihost_requires_pad_to_full():
    with pytest.raises(AssertionError):
        BatchLoader(_ArrayDS(8), 4, pad_to_full=False,
                    process_index=0, process_count=2)


def test_shard_batch_single_process_path_unchanged():
    """process_count=1 (every environment we can run): shard_batch keeps the
    device_put behavior and global values."""
    import jax
    from medmamba_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    imgs = np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3)
    lbls = np.arange(8, dtype=np.int64)
    gi, gl = shard_batch(mesh, imgs, lbls, process_count=1)
    np.testing.assert_array_equal(np.asarray(gi), imgs)
    np.testing.assert_array_equal(np.asarray(gl), lbls)
    assert gi.sharding.spec == jax.sharding.PartitionSpec("data")


def test_shard_batch_process_local_assembly():
    """The assembly primitive the multi-process branch uses
    (make_array_from_process_local_data) must reproduce the global batch on
    this 1-process setup (where local slice == global batch), and the
    divisibility guard of the >1 branch must fire on a bad config. On a pod
    the same call assembles per-host slices into the global batch."""
    import jax
    from medmamba_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    nd = mesh.shape["data"]
    b = 2 * nd
    imgs = np.arange(b * 2 * 2 * 3, dtype=np.uint8).reshape(b, 2, 2, 3)
    lbls = np.arange(b, dtype=np.int64)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    g2 = jax.make_array_from_process_local_data(sh, imgs)
    np.testing.assert_array_equal(np.asarray(g2), imgs)
    assert g2.sharding.spec == jax.sharding.PartitionSpec("data")

    # divisibility guard of the >1 branch: global batch 3*3=9 vs data axis 8
    with pytest.raises(AssertionError):
        shard_batch(mesh, imgs[:3], lbls[:3], process_count=3)
