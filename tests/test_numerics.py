"""Double-buffer semantics (counterpart of the reference's
tests/test_double_buffering.py:6-103) + host snapshot buffer."""

import numpy as np
import pytest

from qingdai_tpu.numerics.double_buffer import DoubleBufferingArray, HostDoubleBuffer


def test_read_write_isolation():
    d = DoubleBufferingArray((4, 4))
    d[0, 0] = 5.0
    assert d[0, 0] == 0.0          # reads hit the read buffer
    assert d.write[0, 0] == 5.0
    d.swap()
    assert d[0, 0] == 5.0          # swap exposes the write


def test_sync_and_ufunc_out():
    d = DoubleBufferingArray(np.arange(6.0).reshape(2, 3))
    np.multiply(d, 2.0, out=d)     # reads read-buffer, writes write-buffer
    assert np.allclose(d.read, np.arange(6.0).reshape(2, 3))
    d.swap()
    assert np.allclose(d.read, 2.0 * np.arange(6.0).reshape(2, 3))
    d.sync()
    assert np.allclose(d.write, d.read)


def test_divmod_tuple_out():
    d = DoubleBufferingArray(np.arange(1.0, 7.0).reshape(2, 3))
    q = DoubleBufferingArray((2, 3))
    r = DoubleBufferingArray((2, 3))
    np.divmod(d, 2.0, out=(q, r))
    q.swap(); r.swap()
    qq, rr = np.divmod(np.arange(1.0, 7.0).reshape(2, 3), 2.0)
    assert np.allclose(q.read, qq) and np.allclose(r.read, rr)


def test_self_alias_raises():
    d = DoubleBufferingArray((3,))
    with pytest.raises(ValueError):
        d[:] = d.write  # value reads this buffer's write side


def test_host_double_buffer():
    buf = HostDoubleBuffer()
    assert buf.latest() is None
    buf.publish({"a": 1})
    assert buf.latest() == {"a": 1}
    buf.publish({"a": 2})
    assert buf.latest() == {"a": 2}


def test_lake_merge_across_lon_seam():
    """identify_lakes merges terminal-sink components across the periodic
    longitude boundary."""
    from qingdai_tpu.hydro_network import identify_lakes
    land = np.zeros((8, 12), np.uint8)
    flow = np.full((8, 12), -1, np.int64)
    # a sink region straddling the seam: columns 11 and 0, same rows
    land[3:5, 11] = 1
    land[3:5, 0] = 1
    mask, ids, n = identify_lakes(flow, land)
    assert n == 1
    assert ids[3, 11] == ids[3, 0] == 1
