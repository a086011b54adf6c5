"""Host-side CLI tools: calibration UIs, game drivers, demos."""
