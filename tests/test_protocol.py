import numpy as np
import pytest

from socioreasoner_tpu.protocol import BatchProto


def make_proto(n=8):
    return BatchProto.from_dict(
        tensors={"x": np.arange(n * 3).reshape(n, 3), "y": np.arange(n, dtype=np.float32)},
        non_tensors={"s": [f"str{i}" for i in range(n)]},
        meta={"m": 1},
    )


def test_from_dict_and_len():
    p = make_proto()
    assert len(p) == 8
    assert p.non_tensor["s"].dtype == object
    assert p["s"][3] == "str3"


def test_consistency_error():
    with pytest.raises(ValueError):
        BatchProto(batch={"a": np.zeros((3, 2)), "b": np.zeros((4,))})


def test_select_pop():
    p = make_proto()
    q = p.select(batch_keys=["x"], non_tensor_keys=[])
    assert list(q.batch) == ["x"] and not q.non_tensor
    popped = p.pop(batch_keys=["y"], meta_keys=["m"])
    assert "y" not in p.batch and "y" in popped.batch
    assert popped.meta == {"m": 1} and p.meta == {}


def test_chunk_concat_roundtrip():
    p = make_proto(10)
    parts = p.chunk(3)
    assert [len(c) for c in parts] == [4, 3, 3]
    r = BatchProto.concat(parts)
    np.testing.assert_array_equal(r.batch["x"], p.batch["x"])
    assert list(r.non_tensor["s"]) == list(p.non_tensor["s"])


def test_repeat_interleave():
    p = make_proto(3)
    r = p.repeat(2, interleave=True)
    np.testing.assert_array_equal(r.batch["y"], [0, 0, 1, 1, 2, 2])
    r2 = p.repeat(2, interleave=False)
    np.testing.assert_array_equal(r2.batch["y"], [0, 1, 2, 0, 1, 2])


def test_select_idxs_bool_and_int():
    p = make_proto(6)
    q = p.select_idxs(np.array([True, False, True, False, False, True]))
    np.testing.assert_array_equal(q.batch["y"], [0, 2, 5])
    q2 = p.select_idxs([5, 0])
    np.testing.assert_array_equal(q2.batch["y"], [5, 0])
    assert q2.non_tensor["s"][0] == "str5"


def test_reorder():
    p = make_proto(4)
    p.reorder([3, 2, 1, 0])
    np.testing.assert_array_equal(p.batch["y"], [3, 2, 1, 0])


def test_union():
    p = make_proto(4)
    other = BatchProto.from_dict(tensors={"z": np.ones(4)}, meta={"k": 2})
    p.union(other)
    assert "z" in p.batch and p.meta["k"] == 2
    bad = BatchProto.from_dict(tensors={"w": np.ones(5)})
    with pytest.raises(ValueError):
        p.union(bad)


def test_group_by():
    p = BatchProto.from_dict(tensors={"v": np.arange(6)},
                             non_tensors={"tag": ["a", "b", "a", "c", "b", "a"]})
    groups = p.group_by("tag")
    assert list(groups) == ["a", "b", "c"]
    np.testing.assert_array_equal(groups["a"].batch["v"], [0, 2, 5])


def test_pad_unpad():
    p = make_proto(5)
    padded = p.pad_to_divisor(4)
    assert len(padded) == 8 and padded.meta["_pad_size"] == 3
    back = padded.unpad()
    assert len(back) == 5
    np.testing.assert_array_equal(back.batch["x"], p.batch["x"])
    nop = p.pad_to_divisor(5)
    assert len(nop) == 5 and nop.unpad() is nop


def test_make_iterator():
    p = make_proto(8)
    batches = list(p.make_iterator(3, epochs=2))
    assert [len(b) for b in batches] == [3, 3, 2, 3, 3, 2]
    shuffled = list(p.make_iterator(8, epochs=1, shuffle=True, seed=1))[0]
    assert set(shuffled.batch["y"].tolist()) == set(range(8))
