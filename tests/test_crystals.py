"""Crystal builders (data/crystals.py): stoichiometry, geometry, zone-axis
supercells, point defects."""

import numpy as np
import pytest

from pyslice_tpu.data.crystals import (crystal, orthogonal_supercell,
                                       substitute, vacancies)


def _min_pair_distance(pos):
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    d[np.diag_indices(len(pos))] = np.inf
    return d.min()


class TestPrototypes:
    @pytest.mark.parametrize("kind,elements,n_per_cell", [
        ("sc", "Po", 1), ("fcc", "Au", 4), ("bcc", "Fe", 2),
        ("diamond", "Si", 8), ("zincblende", ("Ga", "As"), 8),
        ("rocksalt", ("Na", "Cl"), 8), ("cscl", ("Cs", "Cl"), 2),
        ("fluorite", ("Ca", "F"), 12), ("hcp", "Mg", 4),
        ("wurtzite", ("Ga", "N"), 8),
    ])
    def test_counts_and_tiling(self, kind, elements, n_per_cell):
        t = crystal(elements, kind, a=4.0, size=(2, 3, 1))
        assert t.n_atoms == n_per_cell * 6
        assert t.n_frames == 1
        # all atoms inside the box
        assert np.all(t.positions[0] >= -1e-9)
        assert np.all(t.positions[0] <= np.diag(t.box_matrix) + 1e-9)

    def test_diamond_bond_length(self):
        a = 5.431
        t = crystal("Si", "diamond", a=a)
        assert _min_pair_distance(t.positions[0]) == pytest.approx(
            a * np.sqrt(3) / 4, rel=1e-9)

    def test_rocksalt_bond_length(self):
        t = crystal(("Na", "Cl"), "rocksalt", a=5.64)
        assert _min_pair_distance(t.positions[0]) == pytest.approx(
            5.64 / 2, rel=1e-9)

    def test_hcp_ideal_nn(self):
        a = 3.21
        t = crystal("Mg", "hcp", a=a, size=(2, 2, 2))
        assert _min_pair_distance(t.positions[0]) == pytest.approx(
            a, rel=1e-9)

    def test_graphene_bond_length_and_vacuum(self):
        a = 2.46
        t = crystal("C", "graphene", a=a, size=(3, 2, 1), vacuum=5.0)
        assert _min_pair_distance(t.positions[0]) == pytest.approx(
            a / np.sqrt(3), rel=1e-9)
        assert np.all(t.positions[0][:, 2] == 5.0)
        assert t.box_matrix[2, 2] == 10.0

    def test_hbn_stoichiometry(self):
        t = crystal(("B", "N"), "hbn", a=2.504, size=(4, 4, 1))
        assert (t.atom_types == 5).sum() == (t.atom_types == 7).sum()

    def test_wurtzite_bond_ideal(self):
        # ideal wurtzite (u = 3/8, c/a = sqrt(8/3)): bond = u*c
        a = 3.19
        t = crystal(("Ga", "N"), "wurtzite", a=a)
        c = a * np.sqrt(8.0 / 3.0)
        assert _min_pair_distance(t.positions[0]) == pytest.approx(
            0.375 * c, rel=1e-9)

    def test_errors(self):
        with pytest.raises(ValueError, match="unknown crystal kind"):
            crystal("Si", "nope", a=4.0)
        with pytest.raises(ValueError, match="element"):
            crystal("Si", "zincblende", a=4.0)
        with pytest.raises(ValueError, match="in-plane"):
            crystal("C", "graphene", a=2.46, size=(2, 2, 2))
        with pytest.raises(ValueError, match="positive"):
            crystal("Si", "diamond", a=4.0, size=(0, 1, 1))


class TestZoneAxis:
    def test_si_110_dumbbells(self):
        a = 5.431
        si = crystal("Si", "diamond", a=a)
        t = orthogonal_supercell(si, (1, 1, 0))
        # smallest [110] orthogonal cell: a x a*sqrt(2) x a*sqrt(2), 16 atoms
        np.testing.assert_allclose(
            np.sort(np.diag(t.box_matrix)),
            np.sort([a, a * np.sqrt(2), a * np.sqrt(2)]), rtol=1e-9)
        assert t.n_atoms == 16
        # the projected (beam-axis) image shows dumbbells split by a/4
        # (atoms within one column project to the same point: distance 0)
        xy = t.positions[0][:, :2]
        d = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
        split = d[d > 1e-6].min()
        assert split == pytest.approx(a / 4, rel=1e-6)

    @pytest.mark.parametrize("zone", [(1, 0, 0), (1, 1, 1), (2, 1, 1),
                                      (3, 1, 0)])
    def test_arbitrary_cubic_zones_volume_checked(self, zone):
        # the volume self-check inside orthogonal_supercell is the real
        # assertion; also verify density is preserved
        au = crystal("Au", "fcc", a=4.08)
        t = orthogonal_supercell(au, zone)
        rho0 = au.n_atoms / np.linalg.det(au.box_matrix)
        rho = t.n_atoms / np.linalg.det(t.box_matrix)
        assert rho == pytest.approx(rho0, rel=1e-9)
        # nearest-neighbor distance is rotation-invariant
        assert _min_pair_distance(t.positions[0]) == pytest.approx(
            4.08 / np.sqrt(2), rel=1e-6)

    def test_min_size_tiling(self):
        si = crystal("Si", "diamond", a=5.431)
        t = orthogonal_supercell(si, (1, 1, 0), min_size=(20.0, 20.0, 10.0))
        assert np.all(np.diag(t.box_matrix) >= np.array([20, 20, 10]) - 1e-9)

    def test_non_cubic_rejected(self):
        t = crystal("Mg", "hcp", a=3.2)
        with pytest.raises(ValueError, match="CUBIC"):
            orthogonal_supercell(t, (1, 1, 0))


class TestDefects:
    def test_substitute_fraction_of_element(self):
        t = crystal(("Ga", "As"), "zincblende", a=5.65, size=(3, 3, 3))
        n_ga = (t.atom_types == 31).sum()
        d = substitute(t, "In", fraction=0.25, of_element="Ga", seed=1)
        assert (d.atom_types == 49).sum() == round(0.25 * n_ga)
        # As sublattice untouched
        assert (d.atom_types == 33).sum() == (t.atom_types == 33).sum()

    def test_vacancies_indices(self):
        t = crystal("Au", "fcc", a=4.08, size=(2, 2, 2))
        d = vacancies(t, indices=[0, 5])
        assert d.n_atoms == t.n_atoms - 2

    def test_pick_validation(self):
        t = crystal("Au", "fcc", a=4.08)
        with pytest.raises(ValueError, match="exactly one"):
            vacancies(t)
        with pytest.raises(ValueError, match="exactly one"):
            substitute(t, "Ag", indices=[0], fraction=0.1)
        with pytest.raises(ValueError, match="out of range"):
            vacancies(t, indices=[99])
        with pytest.raises(ValueError, match=r"fraction must be in \[0, 1\]"):
            vacancies(t, fraction=1.5)
        with pytest.raises(ValueError, match=r"fraction must be in \[0, 1\]"):
            substitute(t, "Ag", fraction=-0.1)

    def test_defect_trajectory_feeds_pipeline(self):
        # builders' output is a valid pipeline input end-to-end (CPU, tiny)
        import jax
        jax.config.update("jax_platforms", "cpu")
        from pyslice_tpu.engine.calculator import MultisliceCalculator
        t = crystal(("B", "N"), "hbn", a=2.504, size=(3, 3, 1), vacuum=3.0)
        t = t.generate_random_displacements(2, 0.03, seed=0)
        calc = MultisliceCalculator()
        calc.setup(t, aperture=0, voltage_eV=100e3, sampling=0.4,
                   slice_thickness=2.0, use_cache=False)
        wf = calc.run(progress=False)
        assert np.all(np.isfinite(np.abs(wf.wavefunction_data)))
