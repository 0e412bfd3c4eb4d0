"""Fold (saddle-node) tracking: lockstep bisection of branch ends.

The classic model's warm branch ends at a forcing fold whose location
moves with diffusivity (the hysteresis study's key quantity,
/root/reference/src/plot.jl:173-225 reads it off ramp trajectories);
`ebm.fold` bisects it per ensemble member in lockstep. These tests pin
the bisection mechanics (bracket invariants, lockstep == solo, survival
history), the default ice-area classifier, persistence, and the
validation errors.
"""
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402

ST = ebm.SpaceTime.sin(8, 1000, 1)
D_VALS = np.array([0.45, 0.75])
LO, HI, STEPS = -10.0, 20.0, 4


def _init():
    par = ebm.Collection(ebm.default_parameters("Classic"))
    E0 = np.full(ST.nx, 40.0)
    return par, ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))


@pytest.fixture(scope="module")
def tracked():
    par, init = _init()
    par["D"] = D_VALS
    res = ebm.fold("Classic", ST, par, init, lo=LO, hi=HI, steps=STEPS,
                   tol=0.5, max_years=120)
    return res


class TestFold:
    def test_bracket_invariants(self, tracked):
        # every probe converged, brackets shrank by exactly 2**-steps,
        # and the estimate sits inside [lo, hi]
        assert tracked.ok.all()
        expect = (HI - LO) / 2 ** STEPS
        assert np.allclose(tracked.width, expect)
        assert np.all(tracked.lo < tracked.values)
        assert np.all(tracked.values < tracked.hi)

    def test_fold_moves_with_diffusivity(self, tracked):
        # higher diffusivity ends the warm branch at higher forcing —
        # the trend examples/fold_tracking.py demonstrates
        assert tracked.values[0] < tracked.values[1]

    def test_history_is_the_bisection(self, tracked):
        # replay the bisection from the recorded survivals: the history
        # rows must be exactly the brackets the updates produce
        lo = np.full(len(D_VALS), LO)
        hi = np.full(len(D_VALS), HI)
        for s in range(STEPS):
            mid = 0.5 * (lo + hi)
            hi = np.where(tracked.survived[s], mid, hi)
            lo = np.where(tracked.survived[s], lo, mid)
            assert np.array_equal(tracked.history[s, 0], lo)
            assert np.array_equal(tracked.history[s, 1], hi)
        assert np.array_equal(tracked.lo, lo)
        assert np.array_equal(tracked.hi, hi)

    def test_anchor_is_on_branch(self, tracked):
        from energybalancemodel_jl_tpu.fold import seasonal_ice_area

        assert np.all(np.atleast_1d(tracked.anchor.converged))
        area = seasonal_ice_area(tracked.anchor.seasonal.avg, ST)
        assert np.all(area < np.pi / 2)  # warm branch: little ice

    def test_branch_drift_does_not_fake_a_fold(self):
        # review r5 regression: an anchor-relative tolerance classifier
        # reads the branch's own ice-area drift (0.48 -> 2.78 along this
        # branch, > pi/2) as a departure and stops at the tolerance
        # crossing (~F=-2.3); the nearest-neighbor classifier follows the
        # branch to the real fold (ground-truth probes: alive at F=-4.2,
        # snowball at F=-4.5)
        _, init = _init()
        par = ebm.Collection(ebm.default_parameters("Classic"))
        par["D"] = 0.3
        res = ebm.fold("Classic", ST, par, init, lo=-10.0, hi=20.0,
                       steps=6, tol=0.5, max_years=150)
        assert res.values[0] < -3.0, res

    def test_anchor_reuse_refines_the_bracket(self, tracked):
        # continue the bisection from the returned brackets without
        # paying the anchor equilibration again (init unused: None); the
        # default classifier re-probes hi so its on-branch reference sits
        # at the refined bracket, not at the stale original anchor
        par, _ = _init()
        par["D"] = D_VALS
        fine = ebm.fold("Classic", ST, par, None, lo=tracked.lo,
                        hi=tracked.hi, steps=2, anchor=tracked.anchor,
                        tol=0.5, max_years=120)
        assert np.allclose(fine.width, tracked.width / 4)
        assert np.all(np.minimum(tracked.lo, tracked.hi)
                      <= fine.values)
        assert np.all(fine.values <= np.maximum(tracked.lo, tracked.hi))

    def test_anchor_member_mismatch_rejected(self, tracked):
        par, init = _init()
        par["D"] = np.array([0.4, 0.6, 0.8])
        with pytest.raises(ValueError, match="members"):
            ebm.fold("Classic", ST, par, init, lo=LO, hi=HI, steps=1,
                     anchor=tracked.anchor, tol=0.5, max_years=120)

    def test_vary_par_key_with_reversed_bracket(self):
        # bisect the OLR constant A upward from a warm anchor: the branch
        # survives at the LOW end, so hi < lo — the bisection only
        # assumes "survives at hi" (ground truth: warm at A=193,
        # snowball by A=210 at this config)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        par["F"] = 10.0
        E0 = np.full(ST.nx, 40.0)
        init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
        res = ebm.fold("Classic", ST, par, init, lo=280.0, hi=193.0,
                       vary="A", steps=4, tol=0.5, max_years=150)
        assert res.vary == "A"
        assert res.hi[0] < res.lo[0]  # reversed bracket preserved
        assert 193.0 < res.values[0] < 230.0, res

    def test_default_classifier_requires_lo_probe(self):
        par, init = _init()
        with pytest.raises(ValueError, match="check_lo"):
            ebm.fold("Classic", ST, par, init, lo=LO, hi=HI, steps=1,
                     check_lo=False)

    def test_lockstep_matches_solo(self, tracked):
        par, init = _init()
        par["D"] = float(D_VALS[1])
        solo = ebm.fold("Classic", ST, par, init, lo=LO, hi=HI,
                        steps=STEPS, tol=0.5, max_years=120)
        assert np.allclose(solo.values, tracked.values[1])
        assert np.array_equal(solo.survived[:, 0], tracked.survived[:, 1])

    def test_save_load_roundtrip(self, tracked):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "fold.h5")
            ebm.save(tracked, path)
            back = ebm.load(path)
        assert isinstance(back, ebm.FoldResult)
        assert back.vary == tracked.vary
        for name in ("lo", "hi", "history", "survived", "probe_converged"):
            assert np.array_equal(getattr(back, name), getattr(tracked, name))
        assert np.allclose(np.asarray(back.anchor.state["E"]),
                           np.asarray(tracked.anchor.state["E"]))
        assert back.spacetime.nx == ST.nx
        assert "FoldResult" in repr(back)
        assert np.allclose(np.asarray(back.par["D"]), D_VALS)

    def test_repr(self, tracked):
        r = repr(tracked)
        assert "F*" in r and "2/2" in r

    def test_plot_fold(self, tracked):
        import matplotlib
        matplotlib.use("Agg", force=True)
        fig = ebm.plot_fold(tracked, against="D")
        line = fig.axes[0].lines[0]
        assert np.allclose(line.get_xdata(), D_VALS)
        assert np.allclose(line.get_ydata(), tracked.values)
        fig2 = ebm.plot_fold(tracked)  # member-index axis
        assert np.allclose(fig2.axes[0].lines[0].get_xdata(), [0, 1])
        with pytest.raises(ValueError, match="against"):
            ebm.plot_fold(tracked, against="nope")

    def test_plot_fold_marks_unconverged(self, tracked):
        import dataclasses

        import matplotlib
        matplotlib.use("Agg", force=True)
        pc = tracked.probe_converged.copy()
        pc[0, 1] = False
        shaky = dataclasses.replace(tracked, probe_converged=pc)
        fig = ebm.plot_fold(shaky)
        labels = [ln.get_label() for ln in fig.axes[0].lines]
        assert any("unconverged" in lb for lb in labels)


class TestFoldValidation:
    def test_unknown_vary(self):
        par, init = _init()
        with pytest.raises(ValueError, match="not in par"):
            ebm.fold("Classic", ST, par, init, lo=0.0, hi=1.0,
                     vary="nope", steps=1)

    def test_member_swept_vary_conflicts(self):
        par, init = _init()
        par["F"] = np.array([0.0, 1.0])
        with pytest.raises(ValueError, match="member-swept"):
            ebm.fold("Classic", ST, par, init, lo=0.0, hi=1.0, steps=1)

    def test_equal_brackets(self):
        par, init = _init()
        with pytest.raises(ValueError, match="must differ"):
            ebm.fold("Classic", ST, par, init, lo=1.0, hi=1.0, steps=1)

    def test_nonpositive_steps(self):
        par, init = _init()
        with pytest.raises(ValueError, match="steps"):
            ebm.fold("Classic", ST, par, init, lo=0.0, hi=1.0, steps=0)

    def test_init_required_without_anchor(self):
        par, _ = _init()
        with pytest.raises(ValueError, match="init"):
            ebm.fold("Classic", ST, par, None, lo=LO, hi=HI, steps=1)

    def test_ramp_forcing_rejected(self):
        par, init = _init()
        ramp = ebm.Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, -0.5))
        with pytest.raises(ValueError, match="constant"):
            ebm.fold("Classic", ST, par, init, lo=0.0, hi=1.0,
                     forcing=ramp, steps=1)

    def test_unconverged_anchor_raises(self):
        par, init = _init()
        with pytest.raises(ValueError, match="anchor"):
            ebm.fold("Classic", ST, par, init, lo=LO, hi=HI, steps=1,
                     tol=1e-12, max_years=1)

    def test_surviving_lo_raises(self):
        # both bracket ends on the warm branch: check_lo must catch it
        par, init = _init()
        with pytest.raises(ValueError, match="survives at lo"):
            ebm.fold("Classic", ST, par, init, lo=19.0, hi=HI, steps=1,
                     tol=0.5, max_years=120)


class TestFoldCheckpoint:
    """fold(checkpoint=, resume=): the remaining bisection steps of a
    resumed search are bit-exact vs an uninterrupted run; extending the
    refinement (more steps) and key mismatches behave as documented."""

    KW = dict(tol=0.5, max_years=120)

    def _run(self, **kw):
        par, init = _init()
        par["D"] = D_VALS
        return ebm.fold("Classic", ST, par, init, lo=LO, hi=HI, **kw)

    def test_resume_is_bit_exact_and_extends(self, tmp_path):
        ckpt = str(tmp_path / "fold.ckpt.h5")
        full = self._run(steps=STEPS, **self.KW)
        short = self._run(steps=2, checkpoint=ckpt, **self.KW)
        # resume continues AND extends (steps excluded from the key)
        res = self._run(steps=STEPS, checkpoint=ckpt, resume=True,
                        **self.KW)
        np.testing.assert_array_equal(res.history, full.history)
        np.testing.assert_array_equal(res.survived, full.survived)
        np.testing.assert_array_equal(res.lo, full.lo)
        np.testing.assert_array_equal(res.hi, full.hi)
        np.testing.assert_array_equal(short.history,
                                      full.history[:2])
        # anchor state round-tripped through the file bit-exactly
        for k in full.anchor.state:
            np.testing.assert_array_equal(
                np.asarray(res.anchor.state[k]),
                np.asarray(full.anchor.state[k]))

    def test_resume_of_finished_run_truncates(self, tmp_path):
        ckpt = str(tmp_path / "fold.ckpt.h5")
        full = self._run(steps=STEPS, checkpoint=ckpt, **self.KW)
        # fewer steps than recorded: the slice is returned, no solves
        res = self._run(steps=2, checkpoint=ckpt, resume=True, **self.KW)
        np.testing.assert_array_equal(res.history, full.history[:2])
        np.testing.assert_array_equal(res.lo, full.history[1, 0])
        np.testing.assert_array_equal(res.hi, full.history[1, 1])

    def test_key_mismatch_warns_and_restarts(self, tmp_path):
        ckpt = str(tmp_path / "fold.ckpt.h5")
        self._run(steps=2, checkpoint=ckpt, **self.KW)
        par, init = _init()
        par["D"] = D_VALS
        with pytest.warns(UserWarning, match="does not match"):
            res = ebm.fold("Classic", ST, par, init, lo=LO - 2.0, hi=HI,
                           steps=2, checkpoint=ckpt, resume=True,
                           **self.KW)
        assert res.history.shape[0] == 2

    def test_resume_needs_checkpoint_path(self):
        par, init = _init()
        with pytest.raises(ValueError, match="needs checkpoint"):
            ebm.fold("Classic", ST, par, init, lo=LO, hi=HI, steps=2,
                     resume=True, **self.KW)
