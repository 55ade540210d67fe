#!/usr/bin/env python
"""Strip a training checkpoint to bare model weights.

Parity with /root/reference/utils/save_weights_only.py: drops optimizer state
and step, keeping only the 'nerf' parameter sub-tree.

  python save_weights_only.py --ckpt_path ckpts/exp/step_10000 \
      [--out_path weights_only]
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--ckpt_path', type=str, required=True,
                        help='checkpoint path')
    parser.add_argument('--out_path', type=str, default=None,
                        help='output path (default: <ckpt_path>_weights)')
    args = parser.parse_args()

    from hypernerf_tpu.training.checkpoints import save_weights_only
    out = args.out_path or args.ckpt_path.rstrip('/') + '_weights'
    save_weights_only(args.ckpt_path, out)
    print('Done!')


if __name__ == '__main__':
    main()
