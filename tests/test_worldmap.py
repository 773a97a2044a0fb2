"""World-map store/edge tests (mirrors reference TensorBundle/edge invariants,
Module/Map/Graph.py)."""

import numpy as np
import pytest

from macvo_tpu.worldmap import Bundle, MultiEdge, RangeEdge, SingleEdge, Store, VisualMap


def test_store_push_and_grow():
    store = Store({"a": ((3,), np.float32), "b": ((), np.int64)}, init_capacity=2)
    idx1 = store.push({"a": np.ones((3, 3)), "b": np.arange(3)})
    assert idx1.tolist() == [0, 1, 2]
    idx2 = store.push({"a": np.zeros((5, 3)), "b": np.arange(5)})
    assert idx2.tolist() == [3, 4, 5, 6, 7]
    assert len(store) == 8
    assert store.data["a"].shape == (8, 3)
    np.testing.assert_array_equal(store.data["b"][:3], np.arange(3))


def test_store_getitem_bundle():
    store = Store({"x": ((2,), np.float32)})
    store.push({"x": np.arange(10, dtype=np.float32).reshape(5, 2)})
    b = store[np.array([1, 3])]
    assert isinstance(b, Bundle)
    assert b.index.tolist() == [1, 3]
    np.testing.assert_array_equal(b.data["x"], [[2, 3], [6, 7]])
    sub = b[np.array([1])]
    assert sub.index.tolist() == [3]


def test_store_push_missing_field_raises():
    store = Store({"a": ((), np.float32), "b": ((), np.float32)})
    with pytest.raises(KeyError):
        store.push({"a": np.zeros(2)})


def test_single_edge():
    e = SingleEdge(init_capacity=2)
    e.set(np.array([0, 1, 5]), np.array([10, 11, 12]))
    np.testing.assert_array_equal(e.project(np.array([5, 0])), [12, 10])
    assert e.project(np.array([2]))[0] == -1


def test_range_edge_project():
    e = RangeEdge(init_capacity=2, max_ranges=2)
    e.add(np.array([0]), np.array([100]), np.array([3]))
    e.add(np.array([0]), np.array([200]), np.array([2]))
    np.testing.assert_array_equal(e.project(np.array([0])), [100, 101, 102, 200, 201])
    with pytest.raises(IndexError):
        e.add(np.array([0]), np.array([300]), np.array([1]))


def test_multi_edge():
    e = MultiEdge(init_capacity=2, max_degree=2)
    e.add(np.array([0, 0, 3]), np.array([7, 8, 9]))
    np.testing.assert_array_equal(e.project(np.array([0])), [7, 8])
    np.testing.assert_array_equal(e.project(np.array([3, 0])), [9, 7, 8])


def _populate_map() -> VisualMap:
    m = VisualMap()
    m.frames.push({
        "K": np.eye(3, dtype=np.float32)[None].repeat(2, 0),
        "baseline": np.full((2,), 0.25, np.float32),
        "pose": np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (2, 1)),
        "T_BS": np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (2, 1)),
        "need_interp": np.zeros(2, bool),
        "time_ns": np.arange(2, dtype=np.int64),
    })
    n = 4
    pt_idx = m.points.push({
        "pos_Tw": np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32),
        "cov_Tw": np.tile(np.eye(3), (n, 1, 1)),
        "color": np.zeros((n, 3), np.uint8),
    })
    match_fields = {
        k: np.zeros((n,) + shape, dt) for k, (shape, dt) in m.match.fields.items()
    }
    match_idx = m.match.push(match_fields)
    m.point2match.add(pt_idx, match_idx)
    m.match2point.set(match_idx, pt_idx)
    m.frame2match.add(np.array([0]), np.array([0]), np.array([n]))
    m.frame2match.add(np.array([1]), np.array([0]), np.array([n]))
    m.match2frame1.set(match_idx, np.zeros(n, np.int64))
    m.match2frame2.set(match_idx, np.ones(n, np.int64))
    return m


def test_visual_map_traversal():
    m = _populate_map()
    frame1 = m.frames[1]
    obs = m.get_frame2match(frame1)
    assert len(obs) == 4
    pts = m.get_match2point(obs)
    assert len(pts) == 4
    f2 = m.get_match2frame2(obs)
    assert set(f2.index.tolist()) == {1}


def test_visual_map_serialize_roundtrip(tmp_path):
    m = _populate_map()
    path = tmp_path / "map.npz"
    m.save(path)
    m2 = VisualMap.load(path)
    assert len(m2.frames) == len(m.frames)
    assert len(m2.points) == len(m.points)
    np.testing.assert_allclose(
        m2.points.data["pos_Tw"], m.points.data["pos_Tw"], atol=0
    )
    obs = m2.get_frame2match(m2.frames[1])
    assert len(obs) == 4
