import json
from pathlib import Path

import h5py
import numpy as np
import pytest

from generative_turbulence_tpu.toolchain import (
    parse_foam,
    serialize_foam,
    edit_foam_file,
)
from generative_turbulence_tpu.toolchain.foam_dicts import Dimensioned, Field
from generative_turbulence_tpu.toolchain.mesher import (
    Box,
    mesh_channel,
    write_blockmesh_dict,
    write_mesh_params,
)
from generative_turbulence_tpu.toolchain.shapes import (
    dataset_split,
    shape_boxes,
    shape_catalog,
    validate_shape,
)
from generative_turbulence_tpu.toolchain.generate import (
    ChannelConfig,
    generate_case,
    mock_solve,
)
from generative_turbulence_tpu.toolchain.convert import (
    add_grid_embedding,
    foam_case_to_h5,
)


class TestFoamDicts:
    def test_parse_entries(self):
        d = parse_foam(
            """
            // a comment
            application pimpleFoam;
            deltaT 1e-05;  /* block */
            writeInterval 0.0001;
            adjustTimeStep yes;
            maxCo 0.4;
            """
        )
        assert d["application"] == "pimpleFoam"
        assert d["deltaT"] == pytest.approx(1e-5)
        assert d["adjustTimeStep"] == "yes"

    def test_nested_dicts_and_lists(self):
        d = parse_foam(
            """
            solvers { p { solver GAMG; tolerance 1e-06; } }
            vertices ( (0 0 0) (1 0 0) );
            """
        )
        assert d["solvers"]["p"]["solver"] == "GAMG"
        assert d["vertices"][0] == [0, 0, 0]

    def test_dimensions_and_fields(self):
        d = parse_foam(
            """
            nu [0 2 -1 0 0 0 0] 1e-05;
            internalField uniform (20 0 0);
            other nonuniform List<scalar> 3 (1 2 3);
            """
        )
        assert isinstance(d["nu"], Dimensioned)
        assert d["nu"].value == pytest.approx(1e-5)
        assert d["internalField"] == Field(True, [20, 0, 0])
        assert d["other"].uniform is False
        assert d["other"].value == [1, 2, 3]

    def test_roundtrip(self):
        text = """
        FoamFile { version 2.0; format ascii; class dictionary; object controlDict; }
        application pimpleFoam;
        deltaT 1e-05;
        solvers { p { solver GAMG; } }
        value uniform (1 2 3);
        """
        d = parse_foam(text)
        d2 = parse_foam(serialize_foam(d))
        assert d2 == d

    def test_edit_file(self, tmp_path):
        f = tmp_path / "controlDict"
        f.write_text("endTime 0.5;\ndeltaT 1e-05;\n")
        with edit_foam_file(f) as d:
            d["endTime"] = 1.0
        d2 = parse_foam(f.read_text())
        assert d2["endTime"] == 1.0
        assert d2["deltaT"] == pytest.approx(1e-5)


class TestMesher:
    def test_no_holes_single_block(self):
        mesh = mesh_channel((8, 4, 4), [], h=(0.1, 0.1, 0.1))
        assert len(mesh.blocks) == 1
        assert len(mesh.boundaries["inlets"]) == 1
        assert len(mesh.boundaries["outlets"]) == 1
        assert len(mesh.boundaries["walls"]) == 4

    def test_hole_decomposition_covers_domain(self):
        hole = Box((2, 1, 1), (4, 3, 3))
        mesh = mesh_channel((8, 4, 4), [hole])
        volume = sum(np.prod(b.size) for b in mesh.blocks)
        assert volume == 8 * 4 * 4 - 2 * 2 * 2
        # hole surface becomes walls: hole has 6 faces exposed
        # (total wall faces: outer y/z faces decomposed + hole faces)
        assert len(mesh.boundaries["walls"]) > 4

    def test_2d_empties(self):
        mesh = mesh_channel((8, 4, 1), [])
        assert "empties" in mesh.boundaries
        assert len(mesh.boundaries["empties"]) == 2

    def test_blockmesh_dict_written(self, tmp_path):
        mesh = mesh_channel((8, 4, 4), [Box((2, 1, 1), (4, 3, 3))], h=(0.01,) * 3)
        write_blockmesh_dict(mesh, tmp_path / "blockMeshDict")
        text = (tmp_path / "blockMeshDict").read_text()
        assert "hex (" in text and "inlets" in text and "walls" in text
        params = write_mesh_params(mesh, tmp_path / "mesh-params.json")
        assert params["cell_counts"] == [8, 4, 4]


class TestShapes:
    def test_catalog_valid_and_split(self):
        cat = shape_catalog()
        assert len(cat) == 45
        for name, rects in cat.items():
            validate_shape(name, rects)
        split = dataset_split(cat)
        assert [len(split[k]) for k in ("train", "val", "test")] == [27, 9, 9]
        all_names = split["train"] + split["val"] + split["test"]
        assert len(set(all_names)) == 45

    def test_wall_attached_families_present(self):
        """The catalog must include snug-to-the-wall obstacles (reference
        generate-shapes.py:74-120 has steps/corners/pillars/full-width bars);
        every rect side is either flush (0) or >= MIN_WALL_DISTANCE away."""
        from generative_turbulence_tpu.toolchain.shapes import (
            CROSS_SECTION,
            MIN_WALL_DISTANCE,
        )

        cat = shape_catalog()
        n = CROSS_SECTION
        wall_attached = set()
        for name, rects in cat.items():
            for r in rects:
                dists = (r.y, n - (r.y + r.h), r.z, n - (r.z + r.w))
                assert all(d == 0 or d >= MIN_WALL_DISTANCE for d in dists), name
                if any(d == 0 for d in dists):
                    wall_attached.add(name)
        assert len(wall_attached) >= 12
        # both snug-validator branches exercised: full-span + corner + fin
        assert {"span-bar", "corner-single", "fin-bottom"} <= wall_attached

    def test_wall_attached_shape_meshes(self):
        cat = shape_catalog()
        for name in ("floor-slab-low", "span-bar", "corner-quad"):
            mesh = mesh_channel((72, 48, 48), shape_boxes(cat[name]))
            assert len(mesh.blocks) > 0
            assert len(mesh.boundaries["inlets"]) > 0
            assert len(mesh.boundaries["outlets"]) > 0

    def test_boxes_extrusion(self):
        cat = shape_catalog()
        boxes = shape_boxes(cat["plus"])
        for b in boxes:
            assert b.lo[0] == 12 and b.hi[0] == 24


@pytest.fixture(scope="module")
def solved_case(tmp_path_factory):
    case_dir = tmp_path_factory.mktemp("cases") / "tiny"
    config = ChannelConfig(
        size=(0.12, 0.06, 0.06),
        cell_counts=(12, 6, 6),
        holes=[Box((3, 2, 2), (5, 4, 4))],
        write_interval=1e-4,
    )
    generate_case(case_dir, config)
    mock_solve(case_dir, config, n_frames=4, seed=0)
    return case_dir, config


class TestCaseGeneration:
    def test_case_layout(self, solved_case):
        case_dir, config = solved_case
        for rel in (
            "system/controlDict",
            "system/fvSchemes",
            "system/fvSolution",
            "system/blockMeshDict",
            "constant/physicalProperties",
            "constant/momentumTransport",
            "0/U",
            "0/p",
            "Allrun",
            "mesh-params.json",
            "constant/polyMesh/points",
            "constant/polyMesh/boundary",
        ):
            assert (case_dir / rel).exists(), rel

        from generative_turbulence_tpu.toolchain.foam_dicts import parse_foam_file

        cd = parse_foam_file(case_dir / "system" / "controlDict")
        assert cd["application"] == "pimpleFoam"
        assert cd["maxCo"] == pytest.approx(0.4)
        mt = parse_foam_file(case_dir / "constant" / "momentumTransport")
        assert mt["LES"]["model"] == "dynamicKEqn"

    def test_conversion_end_to_end(self, solved_case):
        case_dir, config = solved_case
        h5_file = foam_case_to_h5(case_dir, drop_first_time=True)
        add_grid_embedding(h5_file, case_dir)

        with h5py.File(h5_file, "r") as f:
            assert f["physical"].attrs["nu"] == pytest.approx(1e-5)
            n_cells = 12 * 6 * 6 - 2 * 2 * 2
            assert f["data/u"].shape == (3, n_cells, 3)  # first frame dropped
            assert f["data/p"].shape == (3, n_cells)
            assert f["grid/cell_counts"][:].tolist() == [14, 8, 8]
            assert len(f["grid/cell_idx"]) == n_cells
            assert f["boundary-conditions/u/inlets"].attrs["type"] == "fixed-value"
            np.testing.assert_allclose(
                f["boundary-conditions/u/inlets/value"][:], [20, 0, 0]
            )
            assert f["boundary-conditions/u/walls"].attrs["type"] == "fixed-value"
            assert f["boundary-conditions/p/outlets"].attrs["type"] == "fixed-value"

        # The converted file loads through the training data layer.
        from generative_turbulence_tpu.data.schema import read_metadata

        meta = read_metadata(h5_file)
        assert meta.n_cells == 12 * 6 * 6 - 8
        assert not meta.two_dimensional
        # cell types grid is consistent
        types = meta.cell_types
        assert (types == 0).sum() == meta.n_cells
        # boundary indices do not collide with interior
        for desc in meta.boundaries.values():
            assert not np.intersect1d(desc["idx"], meta.cell_idx).size

    def test_mock_frames_survive_production_discard(self, solved_case):
        """Mock frames are stamped AFTER the laminar ramp-up window so the
        shapes protocol's ``discard_first_seconds=0.025`` (the reference's
        convention, config/shapes_diffusion.yaml) keeps them.  Regression: a
        48-frame mock case stamped from t=1e-4 was discarded wholesale and
        training failed with an empty val split."""
        case_dir, _ = solved_case
        h5_file = case_dir / "data.h5"
        with h5py.File(h5_file, "r") as f:
            times = f["data/times"][:]
        assert (times > 0.025).all(), times

    def test_polymesh_owner_ordering(self, solved_case):
        case_dir, _ = solved_case
        from generative_turbulence_tpu.toolchain.convert import read_mesh

        points, faces, owner, neighbour, boundary = read_mesh(case_dir)
        # internal faces: owner < neighbour (upper-triangular)
        assert np.all(owner[: len(neighbour)] < neighbour)
        # boundary patch ranges tile the tail of the face list
        n_internal = len(neighbour)
        starts = sorted(spec["startFace"] for spec in boundary.values())
        assert starts[0] == n_internal
