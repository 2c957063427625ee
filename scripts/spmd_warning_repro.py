"""Audit of the dryrun's 'Involuntary full rematerialization' SPMD warnings
— demonstrating (not asserting) that they are benign.

On a (data=4, model=2) mesh the WGAN-CLS train program logs up to 3 warnings
per compile, each naming a ``f32[B,1,1,1] broadcast(constant)``.  HLO
inspection (round 4) pinned the source: inside the WGAN-GP double backprop,
the cotangent of the critic's scalar logit is a COMPILE-TIME CONSTANT
(−1/B from the batch mean, −α/B from the mismatch term), broadcast to
[B,1,1,1] and fed to the transposed final 4×4 conv:

    %constant.1330 = f32[] constant(-0.0625)              # −α/B = −0.5/8
    %broadcast.281 = f32[8,1,1,1] broadcast(%constant.1330),
        sharding={devices=[4,1,1,1,2]<=[8] last_tile_dim_replicate}
    %conv_general_dilated.129 = f32[8,4,4,16]
        convolution(%broadcast.281, %rev.60), ...

The partitioner picked a transposed layout for the scan-carried conv weight
and cannot "efficiently" reshard a broadcast(constant) to match — so it
"rematerializes": emits the constant broadcast locally per partition.  For
a constant that is free; the warning text just cannot know the operand is
one.  (Hand-built minimal programs with the same conv/scan/TP structure do
NOT reproduce the warning — the trigger needs shardy's exact carry-layout
choice — so this script audits the REAL program instead of a toy.)

What this script does:

1. compiles the actual multichip train step (same config as
   ``__graft_entry__.dryrun_multichip``) on an 8-virtual-CPU-device
   (data=4, model=2) mesh with an HLO dump,
2. finds every broadcast the SPMD partitioner warned about in the
   pre-partitioning module and verifies it is a broadcast of a scalar
   CONSTANT (≤ B·4 bytes of compile-time data),
3. verifies in the post-partitioning module that each such op was emitted
   as a LOCAL broadcast(constant) — i.e. no collective consumes or
   produces the warned tensors: zero communication, zero run-time cost.

Run (no TPU needed; ~2-4 min of CPU XLA compile):
    python scripts/spmd_warning_repro.py
"""

import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _compile_with_dump(dump_dir: str) -> None:
    """Compile the dryrun's feed-path train step on a virtual 8-device mesh
    in a subprocess (platform/XLA flags must precede backend init)."""
    env = dict(os.environ)
    for var in list(env):
        if var.startswith(("PALLAS_AXON", "AXON_", "PJRT_", "TPU_")):
            env.pop(var)
    env["JAX_PLATFORMS"] = "cpu"
    env["_T2I_VIRTUAL_MESH"] = "1"
    env["T2I_NO_COMPILE_CACHE"] = "1"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                        f"--xla_dump_to={dump_dir} "
                        "--xla_dump_hlo_pass_re=spmd")
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    ).format(repo=REPO)
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        raise RuntimeError("dryrun compile failed")
    warned = re.findall(r"Involuntary full rematerialization.*?HLO operation"
                        r" %(\S+) =", proc.stderr)
    print(f"compile done; partitioner warned about {len(warned)} ops: "
          f"{sorted(set(warned))}")
    return len(set(warned))


def _audit(dump_dir: str, n_warned: int) -> int:
    pre = [f for f in os.listdir(dump_dir)
           if f.endswith("before_spmd-partitioning.txt")]
    post = [f for f in os.listdir(dump_dir)
            if f.endswith("after_spmd-partitioning.before_call-inliner.txt")]
    failures = 0
    audited = 0
    for pf in sorted(pre):
        text = open(os.path.join(dump_dir, pf)).read()
        # ops the partitioner warns about carry a reshard between mismatched
        # shardings; find every broadcast-of-constant with an explicit
        # sharding annotation and its op_name metadata
        pat = re.compile(
            r"%(\S+) = f32\[(\d+),1,1,1\]\S* broadcast\(%(constant\S*)\), "
            r"dimensions={}, sharding={[^}]*}, metadata={op_name=\"([^\"]+)\"")
        mod = pf.split(".")[1]
        postf = [p for p in post if p.split(".")[1] == mod]
        ptext = open(os.path.join(dump_dir, postf[0])).read() if postf else ""
        for name, b, const, opname in pat.findall(text):
            audited += 1
            # 1) the warned tensor is a broadcast of a scalar constant
            cdef = re.search(rf"%{re.escape(const)} = f32\[\] constant", text)
            ok_const = cdef is not None
            # 2) post-partitioning: the same op_name appears as a LOCAL
            #    broadcast(constant) and no collective touches it
            local = re.search(
                rf"%(\S+) = f32\[\d+,1,1,1\]\S* broadcast\(%\S+\), "
                rf"dimensions={{}}, metadata={{op_name=\"{re.escape(opname)}\"",
                ptext)
            ok_local = local is not None
            used_by_collective = False
            if local:
                lname = re.escape(local.group(1))
                used_by_collective = re.search(
                    rf"(all-gather|all-reduce|collective-permute|all-to-all)"
                    rf"\(%{lname}\)", ptext) is not None
            verdict = (ok_const and ok_local and not used_by_collective)
            failures += 0 if verdict else 1
            print(f"  {mod}:{opname}: [{int(b)},1,1,1] broadcast of "
                  f"constant={ok_const}, partitioned to local "
                  f"broadcast={ok_local}, consumed by a "
                  f"collective={used_by_collective} -> "
                  f"{'BENIGN' if verdict else 'NEEDS ATTENTION'}")
    if audited < n_warned:
        print(f"\nAUDIT INCOMPLETE: partitioner warned about {n_warned} ops "
              f"but only {audited} matched the broadcast(constant) pattern — "
              f"a NEW warning source exists; inspect the dump")
        return 1
    print(f"\naudited {audited} warned-shape broadcasts "
          f"(>= {n_warned} warned ops); "
          f"{'ALL BENIGN' if failures == 0 else f'{failures} suspicious'}")
    return failures


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="spmd_audit_") as d:
        n_warned = _compile_with_dump(d)
        return 1 if _audit(d, n_warned) else 0


if __name__ == "__main__":
    sys.exit(main())
