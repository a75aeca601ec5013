#!/usr/bin/env bash
# Checkpoint bootstrap (the reference ships download_models.bat)
cd "$(dirname "$0")/.." && exec python -m synt_isic_tpu.app.download_models "$@"
