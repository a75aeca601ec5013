#!/bin/bash
# Launch the browser thin client (no Qt dependency; the TPU-idiomatic GUI).
# Extra args pass through, e.g.:
#   scripts/run_webui.sh --cpu --checkpoints artifacts/.../checkpoints
cd "$(dirname "$0")/.."
exec python -m synt_isic_tpu.app.webui "$@"
