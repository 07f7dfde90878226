"""Native host-runtime library: C++ URDF parser parity vs the Python
parser, and trace-sink roundtrip.  The library is built on demand (the
toolchain is a test prerequisite, like the reference's compiled deps)."""

import numpy as np
import pytest

from cmpc_tpu import native
from cmpc_tpu.rbd import urdf as purdf


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        assert native.build(), "g++ build of native/ failed"
    assert native.available()


REFERENCE_URDF = "/root/reference/code/urdf/hrp4.urdf"


def test_urdf_parser_parity():
    """Native spec == Python spec, field by field, on the HRP-4 URDF."""
    import os
    if not os.path.exists(REFERENCE_URDF):
        pytest.skip("reference URDF not mounted")
    ns = native.parse_urdf_spec(REFERENCE_URDF)
    ps = purdf._read_urdf_xml(REFERENCE_URDF)
    assert ns["name"] == ps["name"]
    assert len(ns["links"]) == len(ps["links"])
    assert len(ns["joints"]) == len(ps["joints"])
    for nl, pl in zip(ns["links"], ps["links"]):
        assert nl["name"] == pl["name"]
        np.testing.assert_allclose(nl["mass"], pl["mass"], rtol=1e-12)
        np.testing.assert_allclose(nl["com"], pl["com"], atol=1e-15)
        np.testing.assert_allclose(nl["inertia"], pl["inertia"],
                                   rtol=1e-9, atol=1e-18)
    for nj, pj in zip(ns["joints"], ps["joints"]):
        for k in ("name", "type", "parent", "child"):
            assert nj[k] == pj[k]
        for k in ("xyz", "rpy", "axis", "limit"):
            np.testing.assert_allclose(nj[k], pj[k], atol=1e-15)


def test_urdf_to_model_end_to_end():
    """Model built from the native spec matches the shipped JSON asset."""
    import os
    if not os.path.exists(REFERENCE_URDF):
        pytest.skip("reference URDF not mounted")
    m_native = purdf.build_model(native.parse_urdf_spec(REFERENCE_URDF))
    m_json = purdf.load_hrp4()
    assert m_native.nb == m_json.nb
    np.testing.assert_allclose(m_native.mass, m_json.mass, rtol=1e-12)
    np.testing.assert_allclose(m_native.T_tree, m_json.T_tree, atol=1e-15)
    np.testing.assert_allclose(m_native.inertia, m_json.inertia,
                               rtol=1e-9, atol=1e-18)


def test_trace_sink_roundtrip(tmp_path):
    p = str(tmp_path / "run.ctrc")
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(1000, 7)).astype(np.float32)
    with native.TraceSink(p, ncols=7, buf_rows=64) as sink:
        sink.append(rows[:500])
        for r in rows[500:]:
            sink.append(r)
        assert sink.rows_written() == 1000
    out = native.TraceSink.read(p)
    np.testing.assert_array_equal(out, rows)


def test_trace_sink_large_throughput(tmp_path):
    """1e6 rows stream without error and read back consistent."""
    p = str(tmp_path / "big.ctrc")
    rows = np.arange(1_000_000 * 4, dtype=np.float32).reshape(-1, 4)
    with native.TraceSink(p, ncols=4) as sink:
        for i in range(0, len(rows), 10_000):
            sink.append(rows[i:i + 10_000])
    out = native.TraceSink.read(p)
    assert out.shape == (1_000_000, 4)
    np.testing.assert_array_equal(out[::99_999], rows[::99_999])
