"""GWD (C_p) computation CLI — the equivalent of
representations/representation_search/gen1_compute.py.

Loops the fixed chosen validation indices, builds the representation on
device, and scores it against the raw events with the quadrant OTMI
protocol; prints the mean C_p.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(args=None):
    p = argparse.ArgumentParser("GWD representation ranking")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--event_representation_name", "--representation",
                   dest="representation", type=str, default="OptimizedRepresentation")
    p.add_argument("--num-events", type=int, default=50000)
    p.add_argument("--img-size", type=int, default=240,
                   help="representation side used by the quadrant crops")
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of samples (full chosen set otherwise)")
    args = p.parse_args(args)

    from ..data.gen1 import Gen1H5
    from ..metrics.chosen_indexes import extract_indexes
    from ..metrics.otmi import otmi
    from ..reps.dispatch import get_item_transform

    ds = Gen1H5(args.data_path, task="val", num_events=args.num_events)
    indices = extract_indexes(args.representation)
    if args.limit:
        indices = indices[: args.limit]

    costs = []
    for idx in indices:
        ev = ds.structured_events(idx)
        rep = get_item_transform(
            ev, args.representation, None, ds.height, ds.width, args.num_events
        )
        events = np.stack([ev["x"], ev["y"], ev["t"], ev["p"]], -1).astype(np.float64)
        c = otmi(events, rep, ds.height, ds.width, rep_size=args.img_size)
        costs.append(c)
        print(f"idx {idx}: C_p = {c:.5f}")
    print(f"mean C_p over {len(costs)} samples: {np.nanmean(costs):.5f}")
    return float(np.nanmean(costs))


if __name__ == "__main__":
    main()
