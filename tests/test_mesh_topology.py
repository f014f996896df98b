"""Slice-aware mesh construction (VERDICT r3 #5).

The driver's default meshes must keep per-frame ring collectives (cyclic
migration ``ppermute``) inside a TPU slice, reserving the DCN seam for ONE
block-wise axis — and every impossible-topology path must be LOUD, never a
silent fallthrough.  Slice topology is mocked through ``mesh._slice_ids``
(CPU devices expose none).
"""

import numpy as np
import pytest

from particlesystem_tpu.parallel import mesh as meshmod


class _Stub:
    """Stand-in device carrying only a slice id (layout tests never build a
    real Mesh from these)."""

    def __init__(self, i, s):
        self.id = i
        self.slice = s

    def __repr__(self):
        return f"d{self.id}@s{self.slice}"


def _stub_granules(n_slices, per_slice):
    return [[_Stub(s * per_slice + i, s) for i in range(per_slice)]
            for s in range(n_slices)]


def test_block_layout_keeps_ring_axes_intra_slice():
    """Pencil (4, 2) over 2 slices of 4: dcn=(2,1), ici=(2,2).  The 'y'
    migration ring of every x-index must stay inside one slice; the 'x'
    ring crosses the seam only at the two block boundaries."""
    arr = meshmod._block_device_array(_stub_granules(2, 4), (2, 2), (2, 1))
    assert arr.shape == (4, 2)
    for i in range(4):
        row_slices = {d.slice for d in arr[i, :]}   # the "y" ring
        assert len(row_slices) == 1, f"y-ring of x={i} spans slices"
    col = [d.slice for d in arr[:, 0]]              # an "x" ring
    crossings = sum(col[i] != col[(i + 1) % 4] for i in range(4))
    assert crossings == 2  # block boundary + wraparound, never per-hop


def test_brick_layout_keeps_both_ring_axes_intra_slice():
    arr = meshmod._block_device_array(_stub_granules(2, 4), (1, 2, 2),
                                      (2, 1, 1))
    assert arr.shape == (2, 2, 2)
    for a in range(2):
        assert len({d.slice for d in arr[a].ravel()}) == 1


def test_default_mesh_routes_through_hybrid_on_slices(monkeypatch):
    """With a mocked 2-slice topology over the 8 CPU devices, the default
    pencil mesh must use the granule-block layout: slice 0's devices fill
    x-rows 0-1, slice 1's fill rows 2-3 (the flat layout would interleave
    them and lay the 'y' rings across the seam)."""
    monkeypatch.setattr(meshmod, "_slice_ids",
                        lambda devs: [i // 4 for i in range(len(devs))])
    m = meshmod.default_mesh((4, 2), ("x", "y"))
    ids = np.vectorize(lambda d: d.id)(m.devices)
    assert ids.shape == (4, 2)
    assert set(ids[:2].ravel()) == {0, 1, 2, 3}   # granule 0 block
    assert set(ids[2:].ravel()) == {4, 5, 6, 7}   # granule 1 block


def test_default_mesh_flat_without_slices():
    m = meshmod.default_mesh((8,), ("x",))
    ids = np.vectorize(lambda d: d.id)(m.devices)
    np.testing.assert_array_equal(ids, np.arange(8))


def test_default_mesh_warns_when_topology_cannot_be_honored(monkeypatch):
    """3 uneven slices cannot tile axis 0 of a (4, 2) mesh — the fallback
    must be visible, not silent (it lays rings across the seam)."""
    monkeypatch.setattr(meshmod, "_slice_ids",
                        lambda devs: [0, 0, 0, 1, 1, 1, 2, 2][:len(devs)])
    with pytest.warns(RuntimeWarning, match="cannot be honored"):
        m = meshmod.default_mesh((4, 2), ("x", "y"))
    assert m.devices.shape == (4, 2)


def test_hybrid_mesh_warns_on_create_hybrid_rejection(monkeypatch):
    """The create_hybrid_device_mesh escape hatch (real-hardware topology
    mismatch) must warn before falling back to the block layout (VERDICT
    r3 weak #7 — the except used to be a silent `pass`)."""
    from jax.experimental import mesh_utils

    monkeypatch.setattr(meshmod, "_slice_ids",
                        lambda d: [i // 4 for i in range(len(d))])

    def boom(*a, **kw):
        raise ValueError("physical topology mismatch")

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", boom)
    with pytest.warns(RuntimeWarning, match="rejected the requested"):
        m = meshmod.hybrid_mesh((4,), (2,), ("x",))
    assert m.devices.shape == (8,)
