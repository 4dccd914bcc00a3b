"""Entry point — ``python main.py --mode {image,video,webcam} ...``,
drop-in compatible with the reference CLI (see fire_tpu/cli.py)."""

from fire_tpu.cli import main

if __name__ == "__main__":
    main()
