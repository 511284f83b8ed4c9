"""EvalLoader sharding/batching semantics (multi-process layout)."""

import numpy as np

from cyclediffusion_tpu.runtime.driver import EvalLoader


class _DS(list):
    pass


def _items(n):
    return [{"sample_id": np.asarray(i), "text": f"t{i}"} for i in range(n)]


def test_single_process_batching():
    loader = EvalLoader(_DS(_items(7)), batch_size=3)
    batches = list(loader)
    assert len(loader) == 3 and len(batches) == 3
    assert [b["sample_id"].shape[0] for b in batches] == [3, 3, 1]
    # arrays stacked, strings listed
    assert isinstance(batches[0]["sample_id"], np.ndarray)
    assert batches[0]["text"] == ["t0", "t1", "t2"]


def test_multi_process_contiguous_shards():
    """Every shard has exactly ceil(n/P) items (ShardSampler repeat-padding,
    trainer.py:288-302); the first n positions in process-major order cover
    the dataset exactly once, so the post-gather truncation restores it."""
    ds = _DS(_items(10))
    per_rank = []
    for rank in range(3):
        loader = EvalLoader(ds, batch_size=2, process_index=rank,
                            process_count=3)
        seen = []
        for batch in loader:
            seen.extend(batch["sample_id"].tolist())
        assert len(seen) == 4  # ceil(10/3)
        per_rank.append(seen)
    flat = [s for shard in per_rank for s in shard]
    assert flat[:10] == list(range(10))
    loader0 = EvalLoader(ds, batch_size=4, process_index=0, process_count=3)
    first = next(iter(loader0))
    assert first["sample_id"].tolist() == [0, 1, 2, 3]


def test_excess_processes_wrap_pad():
    """Ranks beyond the data still produce a full shard (uniform allgather
    shapes); their items are duplicates dropped by the gather truncation."""
    loader = EvalLoader(_DS(_items(2)), batch_size=2, process_index=3,
                        process_count=4)
    assert len(loader) == 1
    batch = next(iter(loader))
    assert batch["sample_id"].tolist() == [0]
