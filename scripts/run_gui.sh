#!/usr/bin/env bash
# GUI launcher (the reference ships run_isicgui.bat for Windows)
cd "$(dirname "$0")/.." && exec python -m synt_isic_tpu.app.gui "$@"
