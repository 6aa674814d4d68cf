#!/usr/bin/env python3
"""Hermetic scenario tests for the benchcmp calibration gate (round 18):
the normalization must (a) excuse a UNIFORM slowdown whose probe reads
matching inflation, (b) keep a REAL regression RED when the probe reads
a calm window, (c) stay RED on inflation with NO probe (old-style logs
get no benefit of the doubt), and (d) pass an identical re-run. Runs in
a temp repo root with a synthetic BENCH reference, so it exercises the
exact code path the gate trusts without touching committed records.
Invoked by tools/gate.sh before the tripwire; exits non-zero on any
scenario mismatch."""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
BENCHCMP = os.path.join(HERE, "benchcmp.py")
SF = "/root/testdata/sf0.1"

# reference: three families, 10 queries x 1.0 s each
REF_FAMS = {"q": [10] * 10, "t": [10] * 10, "v": [10] * 10}
REF_TOTAL = sum(sum(ds) for ds in REF_FAMS.values()) / 10.0


def emit(path, scale, calib=None, cpus=None, calib_fam=None, fam_scale=None):
    """fam_scale overrides `scale` per family; calib_fam emits the
    round-20 {"metric":"calib_fam"} per-family probe line."""
    fam_scale = fam_scale or {}
    total_s = sum(sum(d * fam_scale.get(f, scale) for d in ds)
                  for f, ds in REF_FAMS.items()) / 10.0
    lines = []
    total = json.dumps({"metric": "total", "value": round(total_s, 3),
                        "unit": "sec", "n_queries": 30, "n_failed": 0,
                        "sf": SF}, separators=(",", ":"))
    lines.append(total)
    for f, ds in REF_FAMS.items():
        s = fam_scale.get(f, scale)
        lines.append(json.dumps(
            {"f": f, "ds": [int(round(d * s)) for d in ds]},
            separators=(",", ":")))
    cpus_frag = f',"cpus":{cpus}' if cpus is not None else ''
    if calib_fam is not None:
        m = json.dumps(calib_fam, separators=(",", ":"))
        lines.append('{"metric":"calib_fam","m":' + m + cpus_frag
                     + ',"unit":"sec"}')
    if calib is not None:
        s = json.dumps(calib, separators=(",", ":"))
        lines.append('{"metric":"calib","s":' + s + cpus_frag
                     + ',"unit":"sec"}')
    lines.append(total)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def run(log, root):
    r = subprocess.run([sys.executable, BENCHCMP, log, root],
                       capture_output=True, text=True)
    return r.returncode, r.stdout


def main():
    # the pinned probe cost, read from benchcmp itself so a re-pin can
    # never silently desynchronize the scenarios
    import importlib.util
    spec = importlib.util.spec_from_file_location("benchcmp", BENCHCMP)
    bc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bc)
    ref_s = bc.CALIB_REF_S
    if ref_s is None:
        print("test_benchcmp: CALIB_REF_S unset — nothing to test")
        return 0

    with tempfile.TemporaryDirectory() as root:
        ref_log = os.path.join(root, "ref.log")
        emit(ref_log, 1.0)
        with open(os.path.join(root, "BENCH_r1.json"), "w") as fh:
            json.dump({"rc": 0, "tail": open(ref_log).read()}, fh)

        fails = []

        def check(name, scale, calib, want_rc):
            log = os.path.join(root, name + ".log")
            emit(log, scale, calib)
            rc, out = run(log, root)
            ok = (rc == want_rc)
            print(f"  {name}: rc={rc} (want {want_rc}) {'OK' if ok else 'MISMATCH'}")
            if not ok:
                fails.append(name)
                print(out)

        print(f"test_benchcmp scenarios (pin {ref_s}s):")
        # (a) uniform 1.6x slowdown, probe reads ~1.7x inflation -> green
        check("uniform_inflation_with_probe", 1.6,
              [round(ref_s * 1.7, 3)] * 3, 0)
        # (b) real 2.2x regression, probe reads a calm ~1.05x window -> red
        check("real_regression_calm_probe", 2.2,
              [round(ref_s * 1.05, 3)] * 3, 1)
        # (c) 1.6x slowdown with NO probe -> red (no benefit of the doubt)
        check("inflation_no_probe", 1.6, None, 1)
        # (d) identical re-run, no probe -> green (pre-r18 behavior intact)
        check("identical_no_probe", 1.0, None, 0)
        # (e) the factor cap: probe claims 10x but values are 4x — the
        # capped factor (3) must NOT excuse the residual -> red
        check("cap_blocks_excuse", 4.0, [round(ref_s * 10, 3)] * 3, 1)
        # (f) an EMPTY/crashed retry log must not launder an
        # uncertifiable refusal into a pass (review finding r18)
        log_f = os.path.join(root, "uncertifiable.log")
        emit(log_f, 1.2, [round(ref_s * 10, 3)] * 3)
        empty_retry = os.path.join(root, "empty_retry.log")
        open(empty_retry, "w").write("")
        r = subprocess.run([sys.executable, BENCHCMP, log_f, root,
                            "--retry", empty_retry],
                           capture_output=True, text=True)
        ok = r.returncode == 1
        print(f"  empty_retry_keeps_refusal: rc={r.returncode} (want 1) "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("empty_retry_keeps_refusal")
            print(r.stdout)
        # (g) even-length probe lists take the TRUE median (middle-pair
        # mean), not the worst probe: values 3.0x with probes
        # [1.0x, 2.6x] -> median 1.8x -> normalized 1.67x -> red
        # (the worst-probe bug normalized by 2.6x and passed)
        check("even_median_not_worst_probe", 3.0,
              [round(ref_s * 1.0, 3), round(ref_s * 2.6, 3)], 1)
        # (h) uncertifiable-only red still prints RERUN_FAMILIES (r18
        # advice): nothing grew, the probe alone refused the window —
        # the gate's single-retry path must get a quieter re-probe
        log_h = os.path.join(root, "uncertifiable_only.log")
        emit(log_h, 1.0, [round(ref_s * 10, 3)] * 3)
        rc_h, out_h = run(log_h, root)
        ok = rc_h == 1 and "RERUN_FAMILIES=" in out_h
        print(f"  uncertifiable_only_emits_rerun: rc={rc_h} rerun="
              f"{'yes' if 'RERUN_FAMILIES=' in out_h else 'NO'} "
              f"(want 1/yes) {'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("uncertifiable_only_emits_rerun")
            print(out_h)

    # config-keyed pin scenarios run in their own roots (their reference
    # records carry a different session config)
    ref32 = bc.CALIB_REF_BY_CPUS[32]
    with tempfile.TemporaryDirectory() as root:
        ref_log = os.path.join(root, "ref.log")
        emit(ref_log, 1.0, [round(ref32 * 1.0, 3)] * 3, cpus=32)
        with open(os.path.join(root, "BENCH_r1.json"), "w") as fh:
            json.dump({"rc": 0, "cpus": 32, "tail": open(ref_log).read()}, fh)
        # (i) MATCHED cpus=32: uniform 1.6x slowdown whose probes read
        # ~1.7x of the 32-cpu pin -> green. The default-config pin
        # (0.82) would read these probes as factor 1 and RED the run —
        # this scenario fails unless the pin is keyed by config.
        log_i = os.path.join(root, "keyed_pin_32.log")
        emit(log_i, 1.6, [round(ref32 * 1.7, 3)] * 3, cpus=32)
        rc_i, out_i = run(log_i, root)
        ok = rc_i == 0
        print(f"  keyed_pin_cpus32_normalizes: rc={rc_i} (want 0) "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("keyed_pin_cpus32_normalizes")
            print(out_i)
        # (j) MISMATCHED configs (gate default-4 vs reference cpus=32):
        # normalization must be REFUSED on both sides — per-side pins
        # would excuse this 1.6x regression (cur probes read 1.7x of
        # the 4-pin), so a green here means cross-config laundering
        log_j = os.path.join(root, "mismatch_refusal.log")
        emit(log_j, 1.6, [round(bc.CALIB_REF_S * 1.7, 3)] * 3)
        rc_j, out_j = run(log_j, root)
        ok = rc_j == 1 and "normalization REFUSED" in out_j
        print(f"  mismatched_config_refuses_normalization: rc={rc_j} "
              f"refused={'yes' if 'normalization REFUSED' in out_j else 'NO'} "
              f"(want 1/yes) {'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("mismatched_config_refuses_normalization")
            print(out_j)

    # main-lane per-family probes (round-20, closing round-19 verdict
    # #2): the gate run's calib_fam line labels each family's
    # bracketing probes, so a family that ran inside a contended
    # stretch of an otherwise-quiet run is excused by ITS OWN window —
    # and a family whose labeled probes are quiet stays RED.
    with tempfile.TemporaryDirectory() as root:
        ref_log = os.path.join(root, "ref.log")
        emit(ref_log, 1.0)
        with open(os.path.join(root, "BENCH_r1.json"), "w") as fh:
            json.dump({"rc": 0, "tail": open(ref_log).read()}, fh)
        # (n) t ran 2.2x slow inside a 2.3x-probed stretch; q/v quiet.
        # The record-wide median (quiet) would RED family t — its own
        # labeled bracket must excuse it.
        quiet = round(ref_s, 3)
        hot = round(ref_s * 2.3, 3)
        log_n = os.path.join(root, "famfac_excuse.log")
        emit(log_n, 1.0, calib=[quiet, quiet, hot, hot, quiet],
             fam_scale={"t": 2.2},
             calib_fam={"q": [quiet, quiet], "t": [hot, hot],
                        "v": [hot, quiet]})
        rc_n, out_n = run(log_n, root)
        ok = rc_n == 0 and "family factors" in out_n
        print(f"  main_lane_family_factor_excuses: rc={rc_n} (want 0) "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("main_lane_family_factor_excuses")
            print(out_n)
        # (o) same 2.2x t but t's OWN labeled probes are quiet — a real
        # regression; the hot brackets elsewhere must not launder it.
        log_o = os.path.join(root, "famfac_red.log")
        emit(log_o, 1.0, calib=[quiet, hot, quiet, quiet, quiet],
             fam_scale={"t": 2.2},
             calib_fam={"q": [quiet, hot], "t": [quiet, quiet],
                        "v": [quiet, quiet]})
        rc_o, out_o = run(log_o, root)
        ok = rc_o == 1 and "family t" in out_o
        print(f"  main_lane_quiet_family_stays_red: rc={rc_o} (want 1) "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("main_lane_quiet_family_stays_red")
            print(out_o)
        # (p) round-20 advice (medium): a family bracket BEYOND the 3x
        # cap is uncertifiable — it must NOT be silently capped and used
        # as that family's divisor (capped 3.0 would excuse this real
        # 2.0x t regression); the family falls back to the record-wide
        # (quiet) factor and REDs. Total stays under THRESH (1.33x) so
        # only the per-family path is exercised.
        vhot = round(ref_s * 10, 3)
        log_p = os.path.join(root, "famfac_beyond_cap.log")
        emit(log_p, 1.0, calib=[quiet, quiet, vhot, vhot, quiet],
             fam_scale={"t": 2.0},
             calib_fam={"q": [quiet, quiet], "t": [vhot, vhot],
                        "v": [vhot, quiet]})
        rc_p, out_p = run(log_p, root)
        ok = rc_p == 1 and "family t" in out_p and "uncertifiable" in out_p
        print(f"  family_bracket_beyond_cap_not_capped: rc={rc_p} (want 1) "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("family_bracket_beyond_cap_not_capped")
            print(out_p)
        # (q) round-20 advice (low): when retry mins are merged, the
        # family factor must be min(gate, retry) — dividing retry-sourced
        # mins by the gate's hot t bracket (2.2x) would excuse this real
        # 2.0x regression that the QUIET retry window confirmed.
        hot22 = round(ref_s * 2.2, 3)
        log_q = os.path.join(root, "famfac_retry_min.log")
        emit(log_q, 1.0, calib=[quiet, quiet, hot22, hot22, quiet],
             fam_scale={"t": 2.0},
             calib_fam={"q": [quiet, quiet], "t": [hot22, hot22],
                        "v": [hot22, quiet]})
        retry_q = os.path.join(root, "famfac_retry_min_retry.log")
        with open(retry_q, "w") as fh:
            fh.write(json.dumps({"metric": "total", "value": 20.0,
                                 "unit": "sec", "n_queries": 10,
                                 "n_failed": 0, "sf": SF},
                                separators=(",", ":")) + "\n")
            fh.write(json.dumps({"f": "t", "ds": [20] * 10},
                                separators=(",", ":")) + "\n")
            fh.write('{"metric":"calib_fam","m":{"t":[%s,%s]},"unit":"sec"}\n'
                     % (quiet, quiet))
            fh.write('{"metric":"calib","s":[%s,%s],"unit":"sec"}\n'
                     % (quiet, quiet))
        r_q = subprocess.run([sys.executable, BENCHCMP, log_q, root,
                              "--retry", retry_q],
                             capture_output=True, text=True)
        ok = r_q.returncode == 1 and "family t" in r_q.stdout
        print(f"  retry_merge_takes_min_family_factor: rc={r_q.returncode} "
              f"(want 1) {'OK' if ok else 'MISMATCH'}")
        if not ok:
            fails.append("retry_merge_takes_min_family_factor")
            print(r_q.stdout)

    # (k) parse_calib accumulates across ALL calib lines (r18 advice:
    # last-match-only dropped earlier probe sets), and parse_cpus
    # refuses ambiguity on mixed-config concatenations
    two = ('{"metric":"calib","s":[1.0,2.0],"cpus":4,"unit":"sec"}\n'
           '{"metric":"calib","s":[3.0],"cpus":4,"unit":"sec"}\n')
    ok = bc.parse_calib(two) == [1.0, 2.0, 3.0] and bc.parse_cpus(two) == 4
    mixed = two + '{"metric":"calib","s":[9.0],"cpus":32,"unit":"sec"}\n'
    # a mixed-config log must yield the "mixed" sentinel (its pin lookup
    # fails loudly -> factor 1), never silently adopt the default pin
    ok = ok and bc.parse_cpus(mixed) == "mixed" and \
        bc.parse_cpus('{"metric":"calib","s":[1.0],"unit":"sec"}') is None
    fm, unc = bc.calib_factor([9.9, 9.9, 9.9], "mixed-log", "mixed")
    ok = ok and fm == 1.0 and not unc
    print(f"  parse_calib_accumulates_and_cpus_unambiguous: "
          f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        fails.append("parse_calib_accumulates_and_cpus_unambiguous")

    # --cold family-keyed calibration scenarios (round 19): the merged
    # detail record's flat calib list pools all families' probes, so a
    # single family whose adopted sample ran hot is under-normalized by
    # the record-wide median (r19's t13/t22 WARNs). With
    # 'calib_by_family' labels, that family's own factor must excuse
    # its window — and a REAL regression under quiet labeled probes
    # must stay RED. Runs against a temp git repo because --cold reads
    # the reference record from HEAD.
    pin = bc.CALIB_REF_S

    def detail_rec(colds, cbf):
        """A minimal bench_detail-shaped record: one memo query per
        family at the given cold, quiet flat probes for every family
        NOT in cbf plus cbf's own samples (exactly how bench_detail.sh
        pools adopted samples into the flat list)."""
        flat = []
        for f in sorted(colds):
            flat += (cbf or {}).get(f, [pin, pin])
        return {"sf": SF, "cpus": None, "calib": flat,
                **({"calib_by_family": cbf} if cbf is not None else {}),
                "queries": {f + "01_q": {"cold": c, "warm": 0.05,
                                         "memo": True}
                            for f, c in colds.items()}}

    def run_cold(name, head_rec, cur_rec, want_rc, want_str=None,
                 ban_str=None):
        with tempfile.TemporaryDirectory() as root:
            with open(os.path.join(root, "bench_detail.json"), "w") as fh:
                json.dump(head_rec, fh)
            env = {**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL":
                   "t@t", "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL":
                   "t@t"}
            for cmd in (["git", "init", "-q"],
                        ["git", "add", "bench_detail.json"],
                        ["git", "commit", "-qm", "ref"]):
                subprocess.run(cmd, cwd=root, env=env, check=True,
                               capture_output=True)
            cur_path = os.path.join(root, "cur_detail.json")
            with open(cur_path, "w") as fh:
                json.dump(cur_rec, fh)
            r = subprocess.run([sys.executable, BENCHCMP, "--cold",
                                cur_path, root],
                               capture_output=True, text=True)
            ok = r.returncode == want_rc \
                and (want_str is None or want_str in r.stdout) \
                and (ban_str is None or ban_str not in r.stdout)
            print(f"  {name}: rc={r.returncode} (want {want_rc}) "
                  f"{'OK' if ok else 'MISMATCH'}")
            if not ok:
                fails.append(name)
                print(r.stdout)

    quiet_cbf = {"q": [pin, pin], "v": [pin, pin]}
    # (l) t's adopted sample ran 3x hot (probes labeled) and its build
    # reads 3x raw; q/v quiet — the flat median is QUIET (factor 1),
    # so without labels this REDs; t's own factor must excuse it
    run_cold("family_factor_excuses_hot_family",
             detail_rec({"q": 2.0, "t": 2.0, "v": 2.0},
                        {**quiet_cbf, "t": [pin, pin]}),
             detail_rec({"q": 2.0, "t": 6.0, "v": 2.0},
                        {**quiet_cbf, "t": [3 * pin, 3 * pin]}),
             0, want_str="family factors", ban_str="memo-build RED")
    # (m) same 3x t build but t's labeled probes are QUIET, and the
    # HEAD record predates labels entirely (no calib_by_family) — the
    # regression is real and must stay RED through the fallback path
    run_cold("real_regression_quiet_family_probes_red",
             detail_rec({"q": 2.0, "t": 2.0, "v": 2.0}, None),
             detail_rec({"q": 2.0, "t": 6.0, "v": 2.0},
                        {**quiet_cbf, "t": [pin, pin]}),
             1, want_str="memo-build RED")

    if fails:
        print("test_benchcmp FAILED: " + ", ".join(fails))
        return 1
    print("test_benchcmp: all scenarios behave")
    return 0


if __name__ == "__main__":
    sys.exit(main())
