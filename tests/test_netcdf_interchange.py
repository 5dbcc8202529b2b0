"""NetCDF-4 interchange proof for the h5py-backed writer.

The reference reads its data files with the real netCDF4 library
(/root/reference/pygcm/routing.py:105-174,
/root/reference/scripts/run_simulation.py:63-183), so "a user can move
`data/` between implementations" requires our h5py shim to emit the actual
netCDF-4 on-disk layout — HDF5 *dimension scales* with netCDF-C's naming
conventions — not merely HDF5 arrays. No netCDF4/xarray/h5netcdf wheel
exists in this environment, so the layout is asserted structurally through
h5py's own (independent) implementation of the HDF5 Dimension Scale
specification, which is exactly what netCDF-C consumes:

- coordinate variables are scales: CLASS=b"DIMENSION_SCALE", NAME=<dim>;
- dims without coordinate variables get netCDF-C's DIM_WITHOUT_VARIABLE
  stub ("This is a netCDF dimension but not a netCDF variable.%10d");
- every data variable axis has a DIMENSION_LIST reference to its scale
  (observable as ds.dims[i] entries) and scales carry REFERENCE_LIST
  back-references;
- dimension datasets carry _Netcdf4Dimid creation order.

(Layout spec: netcdf-c libhdf5/nc4hdf.c + the h5netcdf writer, whose files
netCDF4-python/xarray open as NETCDF4.)
"""

import os

import h5py
import numpy as np
import pytest


@pytest.fixture
def autosave_set(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("QD_N_LAT", "13")
    monkeypatch.setenv("QD_N_LON", "24")
    monkeypatch.setenv("QD_ECO_NS", "3")
    monkeypatch.setenv("QD_PHYTO_NSPECIES", "3")
    monkeypatch.setenv("QD_ECO_INDIV_PER_CELL", "10")
    from qingdai_tpu.world import QingdaiWorld
    w = QingdaiWorld.create_default()
    w.verbose = False
    w.autosave()
    return tmp_path


def _assert_scale(ds, expect_name):
    cls = ds.attrs.get("CLASS")
    assert cls == b"DIMENSION_SCALE", ds.name
    nm = ds.attrs.get("NAME")
    nm = nm.decode(errors="replace") if isinstance(nm, bytes) else str(nm)
    assert nm.rstrip("\x00") == expect_name, (ds.name, nm)
    assert "_Netcdf4Dimid" in ds.attrs, ds.name


def _check_file(path, expect_vars_2d):
    with h5py.File(path, "r") as f:
        # coordinate variables double as dimension scales
        for dim in ("lat", "lon"):
            assert dim in f, path
            _assert_scale(f[dim], dim)
        for name in expect_vars_2d:
            assert name in f, (path, name)
            ds = f[name]
            assert ds.ndim == 2
            # DIMENSION_LIST wiring, read back through h5py's independent
            # dimension-scale API (netCDF-C resolves variables' dims the
            # same way)
            assert "DIMENSION_LIST" in ds.attrs, (path, name)
            for ax, dim in enumerate(("lat", "lon")):
                assert len(ds.dims[ax]) == 1, (path, name, ax)
                scale = ds.dims[ax][0]
                assert scale.name.lstrip("/") == dim, (path, name, ax)
        # scales must carry REFERENCE_LIST back-references
        assert "REFERENCE_LIST" in f["lat"].attrs, path


def test_restart_layout_is_netcdf4(autosave_set):
    _check_file(os.path.join("data", "atmosphere.nc"),
                ["u", "v", "h", "T_s", "cloud_cover", "q", "h_ice",
                 "uo", "vo", "eta", "Ts", "W_land", "S_snow", "C_snow",
                 "land_mask"])


def test_topography_layout_is_netcdf4(autosave_set):
    # `elevation` is intentionally absent: a procedural (no QD_TOPO_NC) run
    # keeps elevation=None and the writer omits the variable, exactly like
    # the reference (run_simulation.py:126-159, elevation optional)
    _check_file(os.path.join("data", "topography.nc"),
                ["land_mask", "base_albedo", "friction"])


def test_topography_layout_with_elevation_is_netcdf4(tmp_path, monkeypatch):
    """The offline-generator export (the SOP path, WITH elevation) also has
    the netCDF-4 dimension-scale layout."""
    import numpy as np
    from qingdai_tpu import topography as topo
    monkeypatch.chdir(tmp_path)
    lat = np.linspace(-90, 90, 13)
    lon = np.linspace(0, 360, 24)
    lon_mesh, lat_mesh = np.meshgrid(lon, lat)
    elev = topo.generate_elevation_map(lat_mesh, lon_mesh, seed=1)
    mask, sea = topo.create_land_sea_mask_from_elevation(elev, lat_mesh)
    alb, fric = topo.generate_base_properties(mask, elev, lat_mesh)
    topo.export_topography_to_netcdf(lat, lon, elev, mask, alb, fric, sea,
                                     "topo_gen.nc")
    _check_file("topo_gen.nc",
                ["elevation", "land_mask", "base_albedo", "friction"])


def test_dim_without_variable_gets_canonical_stub(autosave_set):
    """hydrology.nc has dims (n_land, n_lakes) with no coordinate variable;
    netCDF-C requires the DIM_WITHOUT_VARIABLE stub scale for those."""
    from qingdai_tpu import hydro_network as hn
    import numpy as np
    lat = np.linspace(-90, 90, 13)
    lon = np.linspace(0, 360, 24)
    rng = np.random.default_rng(0)
    elev = rng.standard_normal((13, 24)).cumsum(axis=0) * 100.0
    land = np.zeros((13, 24), np.uint8)
    land[4:9, 4:16] = 1
    net = hn.build_network(lat, lon, elev, land)
    hn.save_network_netcdf("hydro_test.nc", net)
    with h5py.File("hydro_test.nc", "r") as f:
        assert "n_land" in f
        ds = f["n_land"]
        assert ds.attrs.get("CLASS") == b"DIMENSION_SCALE"
        nm = ds.attrs.get("NAME")
        nm = nm.decode(errors="replace") if isinstance(nm, bytes) else str(nm)
        n = int((land == 1).sum())
        assert nm.rstrip("\x00") == (
            "This is a netCDF dimension but not a netCDF variable.%10d" % n)
        # 1-D per-land-cell variables reference it
        assert "flow_order" in f
        assert len(f["flow_order"].dims[0]) == 1
        assert f["flow_order"].dims[0][0].name.lstrip("/") == "n_land"
    # the shim's read path must NOT surface the stub as a variable
    from qingdai_tpu.io.ncdataset import Dataset
    with Dataset("hydro_test.nc", "r") as ds2:
        assert "n_land" not in ds2.variables
        assert "flow_order" in ds2.variables


def test_roundtrip_still_reads_back(autosave_set):
    """The layout change must not break our own reader."""
    from qingdai_tpu.io import netcdf as ncio
    rst = ncio.load_restart(os.path.join("data", "atmosphere.nc"))
    assert rst["T_s"].shape == (13, 24)
    assert np.isfinite(rst["T_s"]).all()
    assert rst["t_seconds"] is not None
