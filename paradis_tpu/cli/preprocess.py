"""Preprocessing CLI — thin wrapper over :mod:`paradis_tpu.data.preprocess`."""

from paradis_tpu.data.preprocess import main

if __name__ == "__main__":
    main()
