"""python -m stereo_vision_tpu — CLI entry (see pipeline.cli)."""

from stereo_vision_tpu.pipeline.cli import main

raise SystemExit(main())
