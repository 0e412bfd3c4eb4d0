"""Basin mapping / edge tracking: lockstep initial-condition probes.

The classic model is bistable in the mid-forcing window (warm branch vs
snowball — the hysteresis the reference reads off ramp trajectories,
/root/reference/src/plot.jl:173-225); `ebm.basins` classifies which
attractor each initial state falls to and `ebm.edge` bisects the basin
boundary along a line in state space. These tests pin the blend/stack
helpers, the gap clustering, the bisection invariants, persistence, and
the validation errors.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402

ST = ebm.SpaceTime.sin(8, 1000, 1)
F = 10.0  # inside the classic bistable window at default parameters
STEPS = 4


def _par():
    return ebm.Collection(ebm.default_parameters("Classic"))


def _state(E0):
    par = _par()
    E = np.full(ST.nx, float(E0))
    return ebm.Collection(E=E, Tg=E / float(par["cw"]))


WARM, COLD = _state(40.0), _state(-300.0)


@pytest.fixture(scope="module")
def mapped():
    w = np.linspace(0.0, 1.0, 6)
    return ebm.basins("Classic", ST, _par(),
                      ebm.blend_states(WARM, COLD, w),
                      forcing=F, tol=0.5, max_years=200)


@pytest.fixture(scope="module")
def tracked():
    return ebm.edge("Classic", ST, _par(), WARM, COLD, forcing=F,
                    steps=STEPS, tol=0.5, max_years=200)


class TestHelpers:
    def test_blend_endpoints(self):
        mid = ebm.blend_states(WARM, COLD, 0.5)
        assert np.allclose(mid["E"], 0.5 * (WARM["E"] + COLD["E"]))
        a = ebm.blend_states(WARM, COLD, 0.0)
        b = ebm.blend_states(WARM, COLD, 1.0)
        assert np.array_equal(a["E"], WARM["E"])
        assert np.array_equal(b["E"], COLD["E"])

    def test_blend_member_axis(self):
        w = np.array([0.0, 0.25, 1.0])
        out = ebm.blend_states(WARM, COLD, w)
        assert out["E"].shape == (3, ST.nx)
        assert np.array_equal(out["E"][0], WARM["E"])
        assert np.array_equal(out["E"][2], COLD["E"])

    def test_blend_batched_endpoints(self):
        # (K, nx) endpoints blend along their own member axis
        K = 3
        a = ebm.Collection(E=np.tile(WARM["E"], (K, 1)),
                           Tg=np.tile(WARM["Tg"], (K, 1)))
        b = ebm.Collection(E=np.tile(COLD["E"], (K, 1)),
                           Tg=np.tile(COLD["Tg"], (K, 1)))
        out = ebm.blend_states(a, b, np.array([0.0, 0.5, 1.0]))
        assert out["E"].shape == (K, ST.nx)
        assert np.array_equal(out["E"][0], WARM["E"])
        assert np.array_equal(out["E"][2], COLD["E"])

    def test_stack_states(self):
        st = ebm.stack_states([WARM, COLD])
        assert st["E"].shape == (2, ST.nx)
        assert np.array_equal(st["E"][1], COLD["E"])

    def test_stack_key_mismatch(self):
        with pytest.raises(ValueError, match="different variables"):
            ebm.stack_states([WARM, ebm.Collection(E=WARM["E"])])


class TestBasins:
    def test_two_attractors(self, mapped):
        assert mapped.n_basins == 2
        assert (mapped.labels >= 0).all()  # all converged
        assert int(mapped.counts.sum()) == 6
        # centroids ascend; warm (small area) vs snowball (large)
        assert mapped.centroids[0] < np.pi < mapped.centroids[1]

    def test_labels_monotone_along_the_line(self, mapped):
        # one boundary crossing on the warm->cold line: labels sorted
        assert (np.diff(mapped.labels) >= 0).all()
        assert mapped.labels[0] == 0 and mapped.labels[-1] == 1

    def test_fractions_and_members(self, mapped):
        assert np.isclose(mapped.fractions.sum(), 1.0)
        m0 = mapped.members(0)
        assert np.array_equal(
            np.sort(np.concatenate([m0, mapped.members(1)])), np.arange(6))

    def test_sequence_inits_and_repr(self):
        res = ebm.basins("Classic", ST, _par(), [WARM, COLD], forcing=F,
                         tol=0.5, max_years=200)
        assert res.n_basins == 2
        assert "2 attractors" in repr(res)

    def test_single_attractor(self):
        # two starts inside the same (warm) basin: one cluster, no split
        near = ebm.blend_states(WARM, COLD, 0.02)
        res = ebm.basins("Classic", ST, _par(), [WARM, near], forcing=F,
                         tol=0.5, max_years=200)
        assert res.n_basins == 1
        assert np.array_equal(res.labels, [0, 0])
        assert res.centroids[0] < np.pi  # the warm attractor

    def test_gap_merges_everything(self, mapped):
        # a gap larger than the warm/snowball separation: one cluster
        from energybalancemodel_jl_tpu.basins import _cluster_1d
        labels, cent, counts = _cluster_1d(mapped.areas, gap=10.0)
        assert len(cent) == 1 and counts[0] == 6


class TestEdge:
    def test_bracket_invariants(self, tracked):
        assert tracked.ok.all()
        assert np.allclose(tracked.width, 2.0 ** -STEPS)
        assert np.all(0.0 < tracked.values) and np.all(tracked.values < 1.0)
        # the a endpoint is warm, b is snowball, separated in area
        assert np.all(np.abs(tracked.area_a - tracked.area_b) > np.pi / 2)

    def test_history_is_the_bisection(self, tracked):
        wa = np.zeros(len(tracked.wa))
        wb = np.ones(len(tracked.wb))
        for s in range(STEPS):
            mid = 0.5 * (wa + wb)
            wa = np.where(tracked.in_a[s], mid, wa)
            wb = np.where(tracked.in_a[s], wb, mid)
            assert np.array_equal(tracked.history[s, 0], wa)
            assert np.array_equal(tracked.history[s, 1], wb)
        assert np.array_equal(tracked.wa, wa)
        assert np.array_equal(tracked.wb, wb)

    def test_edge_states_split(self, tracked):
        # the returned boundary blends straddle the boundary: nudging to
        # either bracket end falls to that end's attractor
        from energybalancemodel_jl_tpu.fold import seasonal_ice_area
        for w, ref in ((tracked.wa, tracked.area_a),
                       (tracked.wb, tracked.area_b)):
            res = ebm.equilibrate(
                "Classic", ST, F, _par(),
                ebm.blend_states(tracked.a, tracked.b, w),
                tol=0.5, max_years=200)
            area = np.atleast_1d(
                seasonal_ice_area(res.seasonal.avg, ST))
            assert np.all(np.abs(area - ref) < np.pi / 2)

    def test_consistent_with_basins(self, mapped, tracked):
        # the basin map's label flip brackets the edge estimate
        w = np.linspace(0.0, 1.0, 6)
        flip = int(np.flatnonzero(np.diff(mapped.labels))[0])
        assert w[flip] <= float(tracked.values[0]) <= w[flip + 1]

    def test_member_sweep_moves_the_edge(self):
        par = _par()
        par["F"] = np.array([5.0, 15.0])
        # 8 steps: the F=5 vs F=15 boundary shift is ~0.05 in w, below
        # the 4-step bracket resolution of 1/16 (measured 0.053 vs 0.107)
        res = ebm.edge("Classic", ST, par, WARM, COLD, forcing=0.0,
                       steps=8, tol=0.5, max_years=200)
        assert res.ok.all()
        assert res.values.shape == (2,)
        # stronger forcing favors the warm attractor: the boundary moves
        # toward the cold endpoint
        assert res.values[0] < res.values[1]

    def test_states_shape_and_repr(self, tracked):
        st = tracked.states()
        assert st["E"].shape == (1, ST.nx)
        assert "w* =" in repr(tracked)


@pytest.fixture(scope="module")
def attractors():
    """The two converged endpoint attractor states (and their areas)."""
    from energybalancemodel_jl_tpu.fold import seasonal_ice_area
    res = ebm.equilibrate("Classic", ST, F, _par(),
                          ebm.stack_states([WARM, COLD]),
                          tol=0.5, max_years=200)
    assert np.all(np.asarray(res.converged))
    a = ebm.Collection({k: np.asarray(v)[0] for k, v in res.state.items()})
    b = ebm.Collection({k: np.asarray(v)[1] for k, v in res.state.items()})
    areas = np.asarray(seasonal_ice_area(res.seasonal.avg, ST))
    return a, b, float(areas[0]), float(areas[1])


@pytest.fixture(scope="module")
def refined():
    """End-to-end edge_state from the raw warm/cold inits."""
    return ebm.edge_state("Classic", ST, _par(), WARM, COLD, forcing=F,
                          commit_years=200, commit_tol=0.5,
                          stability_kwargs=dict(dtype="float64"))


class TestEdgeState:
    def test_end_to_end_converges_between_the_attractors(self, refined,
                                                         attractors):
        _, _, area_a, area_b = attractors
        # the polish reaches the classic stationarity floor (measured
        # ~0.7 at this config; the albedo hole bounds it from below)
        assert refined.converged and refined.resid <= 1.0
        assert refined.polish_nfev > 0
        lo, hi = sorted((area_a, area_b))
        assert lo + 0.3 < refined.area < hi - 0.3
        n = refined.stages_run
        assert (len(refined.tracked_years) == n
                and len(refined.separation) == n)
        assert np.isnan(refined.drift[0]) and np.isfinite(refined.drift[1:]).all()
        assert refined.stability is not None
        assert refined.stability.side == "right"
        assert "converged" in repr(refined)

    def test_edge_state_straddles_the_boundary(self, refined, attractors):
        # THE defining property: nudging the refined state toward either
        # attractor commits to THAT attractor — the state sits on the
        # basin boundary (finite-scale instability, regardless of what
        # the infinitesimal linearization reads on this non-smooth map;
        # see the edge_state docstring on chattering)
        from energybalancemodel_jl_tpu.fold import seasonal_ice_area
        aeq, beq, area_a, area_b = attractors
        pa = ebm.blend_states(refined.state, aeq, 0.1)
        pb = ebm.blend_states(refined.state, beq, 0.1)
        res = ebm.equilibrate("Classic", ST, F, _par(),
                              ebm.stack_states([pa, pb]),
                              tol=0.5, max_years=300)
        areas = np.asarray(seasonal_ice_area(res.seasonal.avg, ST))
        assert abs(areas[0] - area_a) < 0.5
        assert abs(areas[1] - area_b) < 0.5

    def test_saddle_spectrum(self, attractors):
        # seeded near the clean warm-boundary saddle (neighborhood
        # measured by a dense multi-start TRF ladder scan at this
        # config: area 1.831, resid floor ~0.6, spectrum 1.02-1.09 then
        # 0.89-0.91), edge_state converges a genuine codimension-1
        # saddle: EXACTLY one year-map eigenvalue above 1
        aeq, beq, area_a, area_b = attractors
        guess = ebm.Collection(
            E=np.array([93.6, 72.2, 18.8, -5.9, -15.2, -38.6, -58.5,
                        -75.0]),
            Tg=np.array([8.86, 6.67, 1.29, -12.1, -25.7, -38.8, -50.7,
                         -61.3]))
        res = ebm.edge_state(
            "Classic", ST, _par(), ebm.blend_states(guess, aeq, 0.05),
            ebm.blend_states(guess, beq, 0.05), forcing=F,
            refs=(area_a, area_b), stages=4, commit_years=200,
            commit_tol=0.5,
            stability_kwargs=dict(dtype="float64", n_modes=2))
        assert res.converged
        assert abs(res.area - 1.831) < 0.3
        growth = np.asarray(res.stability.growth).reshape(-1)
        assert growth[0] > 1.0          # the unstable (escape) mode
        assert growth[1] < 1.0          # ... and only that one
        assert "|lambda|" in repr(res)

    def test_refine_slices_a_member(self, tracked):
        res = tracked.refine("Classic", forcing=F, member=0, stages=2,
                             commit_years=200, commit_tol=0.5,
                             polish_max_nfev=40, stability_check=False)
        assert isinstance(res, ebm.EdgeStateResult)
        assert res.stability is None
        assert res.polish_nfev > 0
        assert res.season == tracked.season

    def test_refine_member_out_of_range(self, tracked):
        with pytest.raises(ValueError, match="member"):
            tracked.refine("Classic", forcing=F, member=5)

    def test_polish_false_reports_the_raw_midpoint(self, attractors):
        aeq, beq, area_a, area_b = attractors
        res = ebm.edge_state("Classic", ST, _par(), aeq, beq, forcing=F,
                             refs=(area_a, area_b), stages=1,
                             commit_years=200, commit_tol=0.5,
                             polish=False, stability_check=False)
        assert res.polish_nfev == 0
        assert np.isfinite(res.resid)

    def test_miz_carry_has_no_E_leaf(self):
        # regression (review r3): the default drift metric read mid["E"],
        # which the MIZ carry does not have (Ei/Ew/h/D/phi/T0) — the MIZ
        # path crashed with KeyError at stage 2; default now spans every
        # carry leaf. Fake refs: only the tracker mechanics are on trial.
        st = ebm.SpaceTime.sin(8, 200, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        a = ebm.zeros_init(st)
        b = ebm.Collection({k: np.asarray(v) * 0.5 for k, v in a.items()})
        b["h"] = np.full(st.nx, 2.0)
        b["phi"] = np.full(st.nx, 1.0)
        b["Ei"] = np.full(st.nx, -20.0)
        res = ebm.edge_state("MIZ", st, par, a, b, forcing=0.0, stages=2,
                             probes=2, rounds=1, flight_years=2,
                             flight_chunk=1, commit_years=3,
                             commit_tol=100.0, refs=(0.0, 5.0),
                             polish=False, stability_check=False)
        assert res.stages_run == 2
        assert np.isfinite(res.drift[1])
        with pytest.raises(ValueError, match="metric leaves"):
            ebm.edge_state("MIZ", st, par, a, b, forcing=0.0, stages=2,
                           probes=2, rounds=1, flight_years=2,
                           flight_chunk=1, commit_years=3,
                           commit_tol=100.0, refs=(0.0, 5.0),
                           metric=("E",), polish=False,
                           stability_check=False)

    def test_validation_errors(self):
        par = _par()
        par["F"] = np.array([5.0, 15.0])
        with pytest.raises(ValueError, match="ONE member"):
            ebm.edge_state("Classic", ST, par, WARM, COLD, forcing=0.0)
        batched = ebm.stack_states([WARM, COLD])
        with pytest.raises(ValueError, match="member-batched"):
            ebm.edge_state("Classic", ST, _par(), batched, COLD, forcing=F)
        with pytest.raises(ValueError, match="same basin|jump_tol"):
            ebm.edge_state("Classic", ST, _par(), WARM, COLD, forcing=F,
                           refs=(1.0, 1.2))
        with pytest.raises(ValueError, match="season"):
            ebm.edge_state("Classic", ST, _par(), WARM, COLD, forcing=F,
                           season="sumer")
        with pytest.raises(ValueError, match="constant"):
            ebm.edge_state("Classic", ST, _par(), WARM, COLD,
                           forcing=ebm.Forcing(0.0, 5.0, -5.0, (10, 10),
                                               (0.5, -0.5)))
        with pytest.raises(ValueError, match="flight_years"):
            ebm.edge_state("Classic", ST, _par(), WARM, COLD, forcing=F,
                           flight_years=2, flight_chunk=4)

    def test_roundtrip(self, refined, tmp_path):
        path = str(tmp_path / "edge_state.h5")
        ebm.save(refined, path)
        back = ebm.load(path)
        assert isinstance(back, ebm.EdgeStateResult)
        assert np.allclose(back.state["E"], np.asarray(refined.state["E"]))
        assert back.resid == refined.resid
        assert back.polish_nfev == refined.polish_nfev
        assert back.converged == refined.converged
        assert np.allclose(back.stability.growth,
                           np.asarray(refined.stability.growth))


class TestEdgeUnconvergedProbes:
    """VERDICT r2 #8: starved probes must be DETECTABLE, and the
    checkpoint contract must not let a starved search masquerade as a
    trusted one."""

    def test_starved_probes_flag_ok_false(self, attractors):
        aeq, beq, _, _ = attractors
        starved = ebm.edge("Classic", ST, _par(), aeq, beq, forcing=F,
                           steps=3, tol=0.5, max_years=4)
        # every probe ran out of years finitely: classified (bracket
        # moved) but flagged — the documented recover-by-re-run case
        assert not starved.ok.any()
        assert not starved.probe_converged.any()
        assert starved.probe_finite.all()
        trusted = ebm.edge("Classic", ST, _par(), aeq, beq, forcing=F,
                           steps=3, tol=0.5, max_years=200)
        assert trusted.ok.all()

    def test_resume_with_larger_max_years_restarts(self, attractors,
                                                   tmp_path):
        # max_years is deliberately part of the checkpoint fingerprint
        # (unlike equilibrate's pure-continuation resume): a starved
        # search's recorded probes are untrustworthy, so extending
        # max_years must NOT splice onto them — it warns and re-runs
        aeq, beq, _, _ = attractors
        ck = str(tmp_path / "edge.ck")
        starved = ebm.edge("Classic", ST, _par(), aeq, beq, forcing=F,
                           steps=3, tol=0.5, max_years=4, checkpoint=ck)
        assert not starved.ok.any()
        with pytest.warns(UserWarning, match="does not match"):
            repaired = ebm.edge("Classic", ST, _par(), aeq, beq,
                                forcing=F, steps=3, tol=0.5,
                                max_years=200, checkpoint=ck, resume=True)
        assert repaired.ok.all()
        trusted = ebm.edge("Classic", ST, _par(), aeq, beq, forcing=F,
                           steps=3, tol=0.5, max_years=200)
        assert np.array_equal(repaired.values, trusted.values)


class TestValidation:
    def test_same_basin_raises(self):
        nudged = ebm.blend_states(WARM, WARM, 0.5)
        with pytest.raises(ValueError, match="same basin|jump_tol"):
            ebm.edge("Classic", ST, _par(), WARM, nudged, forcing=F,
                     steps=2, tol=0.5, max_years=200)

    def test_key_mismatch(self):
        with pytest.raises(ValueError, match="different variables"):
            ebm.edge("Classic", ST, _par(), WARM,
                     ebm.Collection(E=COLD["E"]), forcing=F)

    def test_ramp_forcing_rejected(self):
        ramp = ebm.Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, -0.5))
        with pytest.raises(ValueError, match="constant"):
            ebm.edge("Classic", ST, _par(), WARM, COLD, forcing=ramp)

    def test_nonpositive_steps(self):
        with pytest.raises(ValueError, match="steps"):
            ebm.edge("Classic", ST, _par(), WARM, COLD, forcing=F,
                     steps=0)

    def test_blend_key_mismatch(self):
        with pytest.raises(ValueError, match="different variables"):
            ebm.blend_states(WARM, ebm.Collection(E=COLD["E"]), 0.5)

    def test_bad_season_fails_before_any_solve(self):
        # both entry points validate season up front (a typo must not
        # cost the endpoint/ensemble solves before raising)
        with pytest.raises(ValueError, match="season"):
            ebm.edge("Classic", ST, _par(), WARM, COLD, forcing=F,
                     season="sumer")
        with pytest.raises(ValueError, match="season"):
            ebm.basins("Classic", ST, _par(), [WARM, COLD], forcing=F,
                       season="sumer")

    def test_finite_members_flags_nan_states(self):
        # the NaN guard: a diverged member's masked ice area reads 0 (an
        # artifact), so classification must skip it — _finite_members is
        # the per-member predicate both drivers use
        from types import SimpleNamespace

        from energybalancemodel_jl_tpu.basins import _finite_members
        good = np.ones((3, ST.nx))
        bad = good.copy()
        bad[1, 2] = np.nan
        # member_years marks the result as an ensemble solve — the exact
        # batched/solo signal (review r3), replacing the shape heuristic
        myears = np.zeros(3)
        res = SimpleNamespace(state={"E": bad, "Tg": good},
                              member_years=myears)
        assert np.array_equal(_finite_members(res, 3),
                              [True, False, True])
        # a shared (unbatched) non-finite leaf poisons every member
        res2 = SimpleNamespace(state={"E": good,
                                      "Tg": np.full(ST.nx, np.nan)},
                               member_years=myears)
        assert not _finite_members(res2, 3).any()
        # a solo result (member_years=None) flags the whole state at once
        solo = SimpleNamespace(state={"E": np.ones(ST.nx)},
                               member_years=None)
        assert _finite_members(solo, 1).all()
        solo_bad = SimpleNamespace(state={"E": np.full(ST.nx, np.nan)},
                                   member_years=None)
        assert not _finite_members(solo_bad, 1).any()


class TestPlots:
    def test_plot_basins(self, mapped):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        w = np.linspace(0.0, 1.0, 6)
        fig = ebm.plot_basins(mapped, x=w)
        ax = fig.axes[0]
        # one scatter per attractor + one centroid line each
        labels = [ln.get_label() for ln in ax.lines]
        assert sum("attractor" in lb for lb in labels) == 2
        pts = np.concatenate([ln.get_xdata() for ln in ax.lines
                              if "attractor" in ln.get_label()])
        assert np.allclose(np.sort(pts), w)
        plt.close(fig)

    def test_plot_basins_marks_unconverged(self, mapped):
        import dataclasses

        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        labels = mapped.labels.copy()
        labels[3] = -1
        shaky = dataclasses.replace(mapped, labels=labels)
        fig = ebm.plot_basins(shaky)
        names = [ln.get_label() for ln in fig.axes[0].lines]
        assert any("unconverged" in lb for lb in names)
        plt.close(fig)

    def test_plot_edge(self):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        par = _par()
        par["F"] = np.array([8.0, 12.0])
        res = ebm.edge("Classic", ST, par, WARM, COLD, forcing=0.0,
                       steps=2, tol=0.5, max_years=200)
        fig = ebm.plot_edge(res, against="F")
        line = fig.axes[0].lines[0]
        assert np.allclose(line.get_xdata(), [8.0, 12.0])
        assert np.allclose(line.get_ydata(), res.values)
        plt.close(fig)
        fig2 = ebm.plot_edge(res)  # member-index axis
        assert np.allclose(fig2.axes[0].lines[0].get_xdata(), [0, 1])
        plt.close(fig2)
        with pytest.raises(ValueError, match="against"):
            ebm.plot_edge(res, against="nope")


class TestEdgeCheckpoint:
    KW = dict(forcing=F, tol=0.5, max_years=200)

    def test_resume_is_bit_exact_and_extends(self, tmp_path):
        ck = str(tmp_path / "edge.ck")
        full = ebm.edge("Classic", ST, _par(), WARM, COLD, steps=STEPS,
                        **self.KW)
        part = ebm.edge("Classic", ST, _par(), WARM, COLD, steps=2,
                        checkpoint=ck, **self.KW)
        res = ebm.edge("Classic", ST, _par(), WARM, COLD, steps=STEPS,
                       checkpoint=ck, resume=True, **self.KW)
        assert np.array_equal(res.history[:2], part.history)
        assert np.array_equal(res.wa, full.wa)
        assert np.array_equal(res.wb, full.wb)
        assert np.array_equal(res.in_a, full.in_a)
        assert np.allclose(res.area_a, full.area_a)

    def test_resume_of_finished_run_truncates(self, tmp_path):
        ck = str(tmp_path / "edge.ck")
        full = ebm.edge("Classic", ST, _par(), WARM, COLD, steps=STEPS,
                        checkpoint=ck, **self.KW)
        # no solves happen here: a shorter resume reports the slice
        res = ebm.edge("Classic", ST, _par(), WARM, COLD, steps=2,
                       checkpoint=ck, resume=True, **self.KW)
        assert np.array_equal(res.history, full.history[:2])
        assert np.array_equal(res.wa, full.history[1, 0])
        assert np.array_equal(res.wb, full.history[1, 1])

    def test_key_mismatch_warns_and_restarts(self, tmp_path):
        ck = str(tmp_path / "edge.ck")
        ebm.edge("Classic", ST, _par(), WARM, COLD, steps=1,
                 checkpoint=ck, **self.KW)
        with pytest.warns(UserWarning, match="does not match"):
            res = ebm.edge("Classic", ST, _par(), WARM, COLD, steps=1,
                           checkpoint=ck, resume=True, jump_tol=1.0,
                           **self.KW)
        assert res.width[0] == 0.5

    def test_resume_needs_checkpoint_path(self):
        with pytest.raises(ValueError, match="checkpoint"):
            ebm.edge("Classic", ST, _par(), WARM, COLD, resume=True,
                     **self.KW)


class TestPersistence:
    def test_basins_roundtrip(self, mapped, tmp_path):
        path = str(tmp_path / "basins.h5")
        ebm.save(mapped, path)
        back = ebm.load(path)
        assert isinstance(back, ebm.BasinResult)
        assert np.array_equal(back.labels, mapped.labels)
        assert np.allclose(back.areas, mapped.areas)
        assert np.allclose(back.centroids, mapped.centroids)
        assert back.season == mapped.season and back.gap == mapped.gap
        assert np.allclose(back.result.state["E"],
                           np.asarray(mapped.result.state["E"]))

    def test_edge_roundtrip(self, tracked, tmp_path):
        path = str(tmp_path / "edge.h5")
        ebm.save(tracked, path)
        back = ebm.load(path)
        assert isinstance(back, ebm.EdgeResult)
        assert np.array_equal(back.wa, tracked.wa)
        assert np.array_equal(back.wb, tracked.wb)
        assert np.array_equal(back.in_a, tracked.in_a)
        assert np.allclose(back.area_a, tracked.area_a)
        assert np.array_equal(back.a["E"], np.asarray(tracked.a["E"]))
        assert np.allclose(back.states()["E"], tracked.states()["E"])


# the known warm-boundary saddle at ST/F (measured by the dense
# multi-start TRF ladder scan recorded in TestEdgeState: area 1.831,
# resid floor ~0.6, spectrum one eigenvalue in 1.02-1.09 then 0.89-0.91)
SADDLE = ebm.Collection(
    E=np.array([93.6, 72.2, 18.8, -5.9, -15.2, -38.6, -58.5, -75.0]),
    Tg=np.array([8.86, 6.67, 1.29, -12.1, -25.7, -38.8, -50.7, -61.3]))


class TestUnstableBranch:
    def test_traces_the_middle_branch(self, attractors):
        aeq, beq, area_a, area_b = attractors
        values = np.array([10.0, 11.0, 12.0])
        br = ebm.unstable_branch("Classic", ST, values, _par(), SADDLE,
                                 vary="F", forcing=0.0,
                                 polish_max_nfev=120)
        assert br.converged.all(), [r.resid for r in br.results]
        areas = np.asarray(br.ice_area()).reshape(-1)
        lo, hi = min(area_a, area_b), max(area_a, area_b)
        # the saddle sits strictly BETWEEN the attractors at every level
        assert np.all(areas > lo + 0.3) and np.all(areas < hi - 0.3), areas
        assert abs(areas[0] - 1.831) < 0.3  # the measured F=10 saddle
        # every ContinuationResult diagnostic works on the branch
        assert br.mean("E").shape == (3,)
        # ... including per-level stability: the whole branch is SADDLE
        # (leading |lambda| > 1 at every level — a level that had fallen
        # onto an attractor would read < 1)
        stabs = br.stability(n_iter=25, dtype="float64")
        growths = np.asarray([s.growth for s in stabs])
        assert np.all(growths > 1.0), growths

    def test_falling_off_past_the_fold_is_flagged(self, attractors):
        # F=30 is far outside the bistable window (~[5, 15] at these
        # defaults): the saddle no longer exists, the polish lands on
        # the warm attractor, and the O(1) ice-area jump flags the level
        br = ebm.unstable_branch("Classic", ST, [10.0, 30.0], _par(),
                                 SADDLE, vary="F", forcing=0.0,
                                 polish_max_nfev=60)
        conv = np.asarray(br.converged)
        assert conv[0] and not conv[1], conv

    def test_round_trips_through_save_load(self, tmp_path):
        br = ebm.unstable_branch("Classic", ST, [10.0], _par(), SADDLE,
                                 vary="F", forcing=0.0,
                                 polish_max_nfev=40)
        p = str(tmp_path / "branch.h5")
        ebm.save(br, p)
        back = ebm.load(p)
        np.testing.assert_array_equal(back.values, br.values)
        np.testing.assert_array_equal(
            np.asarray(back.ice_area()), np.asarray(br.ice_area()))

    def test_validation_errors(self):
        par = _par()
        with pytest.raises(ValueError, match="vary"):
            ebm.unstable_branch("Classic", ST, [10.0], par, SADDLE,
                                vary="nope")
        with pytest.raises(ValueError, match="constant"):
            ramp = ebm.Forcing(0.0, 1.0, 0.0, (0, 0), (1.0, -1.0))
            ebm.unstable_branch("Classic", ST, [10.0], par, SADDLE,
                                forcing=ramp)
        with pytest.raises(ValueError, match="solo-only"):
            p = ebm.Collection(par)
            p["D"] = np.array([0.5, 0.6])
            ebm.unstable_branch("Classic", ST, [10.0], p, SADDLE)
        with pytest.raises(ValueError, match="member-batched"):
            ebm.unstable_branch(
                "Classic", ST, [10.0], par,
                ebm.stack_states([SADDLE, SADDLE]))
        with pytest.raises(ValueError, match="values"):
            ebm.unstable_branch("Classic", ST, [], par, SADDLE)
        with pytest.raises(ValueError, match="polish_max_nfev"):
            ebm.unstable_branch("Classic", ST, [10.0], par, SADDLE,
                                polish_max_nfev=0)


def test_polish_scale_guard():
    """The dense Gauss-Newton polish must refuse production-scale grids
    with a clear message instead of silently attempting an hours-long
    multi-GB dense Jacobian (advisor r3)."""
    from energybalancemodel_jl_tpu.basins import _polish_fixed_point

    st = ebm.SpaceTime.sin(128, 500, 1)  # nt*nx*dim = 4.9e7 > the 3e7 cap
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    state = ebm.zeros_init(st)
    with pytest.raises(ValueError, match="practical envelope"):
        _polish_fixed_point("MIZ", st, ebm.Forcing(0.0), par, state,
                            None, 200)
    # the pure residual evaluation (max_nfev=0) is one forward year and
    # stays allowed at any size
    _, resid, nfev = _polish_fixed_point("MIZ", st, ebm.Forcing(0.0), par,
                                         state, None, 0)
    assert nfev == 0 and np.isfinite(resid)
