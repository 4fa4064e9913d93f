import sys

from hopperrender_tpu.cli import main

sys.exit(main())
