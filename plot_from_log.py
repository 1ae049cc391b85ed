#!/usr/bin/env python
"""Loss-curve tool — parses ``Epoch[...]`` lines from a train log and plots
the loss history (reference ``plot_from_log.py`` contract: ``-i log -o png``;
line format per cosnet_tpu/utils/logging.py EPOCH_LINE_FORMAT)."""
import argparse
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

LINE_RE = re.compile(r"^Epoch\[\d+\]\(\d+/\d+\):\s+Loss: ([0-9.eE+-]+)\s+lr:")


def read_log(filename):
    losses = []
    with open(filename) as f:
        for line in f:
            m = LINE_RE.match(line)
            if m:
                losses.append(float(m.group(1)))
    return losses


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", dest="input", required=True)
    parser.add_argument("-o", dest="output", required=True)
    args = parser.parse_args()
    loss = read_log(args.input)
    plt.plot(np.arange(len(loss)), loss)
    plt.xlabel("#iterations")
    plt.ylabel("loss")
    plt.savefig(args.output)
    print(f"{len(loss)} loss points -> {args.output}")


if __name__ == "__main__":
    main()
