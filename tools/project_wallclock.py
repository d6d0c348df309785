"""Project per-scene guided-training wall-clock from measured artifacts.

The reference trains one scene in 3-4 h on 2x V100 (reference README.md,
Quick Start "guidedvd" section: 10k iterations, ~37 diffusion events of 50
guided DDIM steps each at 320x448x25). This tool combines:

  * a guided-run ``timing_summary.json`` (written by GuidedTrainer.train)
    -> measured 3DGS chunk rate + per-event overhead (pc/frozen/artifact
    renders) on the real chip, and
  * optionally a ``DIFFUSION_SMOKE.json`` (tools/diffusion_fullsize_smoke.py)
    -> measured full-size guided-DDIM step cost,

into a projected hours-per-scene at the reference workload. Until real
ViewCrafter weights are wired in, the summary's own generate phase covers
whatever engine the run used (mock/oracle), and the smoke number stands in
for the full-size UNet; the projection makes that substitution explicit.

Usage:
  python tools/project_wallclock.py output/synthetic_guided_e2e \
      [--smoke DIFFUSION_SMOKE.json] [--events 37] [--ddim_steps 50]
"""

import argparse
import json
import os

REFERENCE_HOURS = 3.5  # reference README.md: 3-4 h per scene on 2x V100


def project(summary: dict, smoke: dict | None, events: int,
            ddim_steps: int, iterations: int, tp2: bool = False,
            pipeline: bool = False) -> dict:
    chunk_rate = summary["iterations"] / max(summary["chunk_s"], 1e-9)
    train_s = iterations / chunk_rate

    ph = summary.get("event_phase_s") or {}
    n_run = max(summary.get("events_run", 1), 1)
    overhead_per_event = sum(
        ph.get(k, 0.0) for k in ("pc_render", "frozen", "artifacts")
    ) / n_run

    # prefer the measured COMPLETE event sample (conditioning build + all
    # DDIM steps in one jit) over the single-step extrapolation
    if smoke is not None and "full_sample_s" in smoke.get("timings", {}):
        gen_per_event = smoke["timings"]["full_sample_s"]
        gen_source = "diffusion_fullsize_smoke full_sample"
    elif smoke is not None and "guided_step_run_s" in smoke.get("timings", {}):
        gen_per_event = smoke["timings"]["guided_step_run_s"] * ddim_steps
        gen_source = "diffusion_fullsize_smoke guided_step x ddim_steps"
    else:
        gen_per_event = ph.get("generate", 0.0) / n_run
        gen_source = f"measured {summary.get('engine', '?')} generate phase"

    notes = []
    if tp2:
        # --tp2: the 2-chip config the dryrun's sharded guided-step leg
        # validates (MULTICHIP_r05: TP=2 sharded==unsharded at the
        # 320-channel layout). The guided step's measured anatomy
        # (GUIDED_STEP_PROFILE.json) is pair-fwd + decode-grads + a
        # recompute-bound backward — all dominated by UNet/VAE matmuls and
        # HBM traffic that TP=2 halves per chip; ICI cost at 40x56 latents
        # is small. Conservative model: compute scales 1/2, a 25% ICI/
        # partition-overhead tax on the diffusion event only.
        gen_per_event = gen_per_event * 0.5 * 1.25
        gen_source += " + tp2 model (0.5x compute, +25% partition tax)"
        notes.append("tp2: projection, not a 2-chip measurement — single "
                     "real chip available in this environment")
    event_s = events * (overhead_per_event + gen_per_event)
    if pipeline:
        # engine on disjoint chips, generation overlapped with the next
        # training chunk (PIPELINE_OVERLAP_MESH.json regime): the trainer
        # hides min(chunk_period, generate) per event
        # mean training iterations between events, derived from THIS run's
        # schedule (≈ the config's sample_pseudo_interval; don't hardcode it)
        period_iters = iterations / max(events, 1)
        chunk_period_s = period_iters / chunk_rate
        hidden = events * min(chunk_period_s, gen_per_event)
        event_s -= hidden
        notes.append(f"pipeline: {round(hidden, 1)} s hidden under training "
                     "chunks (engine on disjoint chips)")

    total_s = (
        train_s
        + event_s
        + summary.get("other_s", 0.0)  # compiles etc., paid once
    )
    hours = total_s / 3600.0
    out = {
        "metric": "projected_guided_hours_per_scene",
        "value": round(hours, 2),
        "unit": "h",
        "vs_baseline": round(REFERENCE_HOURS / max(hours, 1e-9), 2),
        "detail": {
            "train_s": round(train_s, 1),
            "chunk_it_per_s": round(chunk_rate, 2),
            "overhead_per_event_s": round(overhead_per_event, 1),
            "generate_per_event_s": round(gen_per_event, 1),
            "generate_source": gen_source,
            "events": events,
            "compile_other_s": summary.get("other_s", 0.0),
            "reference_hours": REFERENCE_HOURS,
        },
    }
    if notes:
        out["detail"]["notes"] = notes
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_path", help="dir containing timing_summary.json")
    p.add_argument("--smoke", default=None,
                   help="DIFFUSION_SMOKE.json from diffusion_fullsize_smoke")
    p.add_argument("--events", type=int, default=37)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--iterations", type=int, default=10_000)
    p.add_argument("--tp2", action="store_true",
                   help="project the 2-chip tensor-parallel engine config "
                        "(validated functionally by the dryrun's sharded "
                        "guided-step leg; cost model documented in project())")
    p.add_argument("--pipeline", action="store_true",
                   help="engine on disjoint chips with generation overlapped "
                        "(PIPELINE_OVERLAP_MESH.json regime)")
    args = p.parse_args()

    with open(os.path.join(args.model_path, "timing_summary.json")) as f:
        summary = json.load(f)
    smoke = None
    if args.smoke and os.path.exists(args.smoke):
        with open(args.smoke) as f:
            smoke = json.load(f)

    out = project(summary, smoke, args.events, args.ddim_steps,
                  args.iterations, tp2=args.tp2, pipeline=args.pipeline)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
