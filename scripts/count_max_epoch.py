"""Epoch budget calculator (reference `src/f5_tts/scripts/count_max_epoch.py`):
given corpus hours, frame budget per device and device count, how many epochs fit in
a step budget."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total-hours", type=float, required=True)
    ap.add_argument("--frames-per-batch", type=int, default=38400)
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--max-updates", type=int, default=1_000_000)
    ap.add_argument("--hop-length", type=int, default=256)
    ap.add_argument("--sample-rate", type=int, default=24000)
    args = ap.parse_args()

    total_frames = args.total_hours * 3600 * args.sample_rate / args.hop_length
    frames_per_update = args.frames_per_batch * args.n_devices * args.grad_accum
    updates_per_epoch = total_frames / frames_per_update
    epochs = args.max_updates / updates_per_epoch
    print(f"frames in corpus:   {total_frames:,.0f}")
    print(f"updates per epoch:  {updates_per_epoch:,.0f}")
    print(f"epochs in {args.max_updates:,} updates: {epochs:.1f}")


if __name__ == "__main__":
    main()
