"""Change-detector sensitivity calibrator (trackbar UI).

Equivalent of reference calibrate_sensitivity.py: tune z-threshold
("Sensitivity" mapped 3.0 - v/20 like the reference :116-118), initial
variance, alpha, and blur over a live intensity-colored overlay; a
hand-test mode counts noise events. Saves sensitivity_settings.json —
and unlike the reference (whose runtime never read that file, SURVEY.md
§5 quirk), this framework's pipeline consumes it via
VisionPipeline(change_settings=...).

Run: python -m chessboard_vision_tpu.tools.calibrate_sensitivity
"""

from __future__ import annotations

import numpy as np

from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.models.pipeline import VisionPipeline, occupancy_to_set
from chessboard_vision_tpu.utils.config import (
    CALIBRATION_FILE,
    SENSITIVITY_FILE,
    load_json_config,
    save_json_config,
)

INTENSITY_COLORS = {1: (80, 190, 250), 2: (0, 140, 255), 3: (0, 0, 255)}  # LEVE/PARCIAL/TOTAL


def main(camera_id: int = 0):
    import cv2

    config = load_json_config(CALIBRATION_FILE)
    if config is None:
        print("run calibration first (tools.calibration_module)")
        return 1
    cap = cv2.VideoCapture(camera_id)
    if not cap.isOpened():
        print("failed to open camera")
        return 1

    win = "Sensitivity"
    cv2.namedWindow(win)
    saved = load_json_config(SENSITIVITY_FILE, {}) or {}
    cv2.createTrackbar("Sensitivity", win, int((3.0 - saved.get("z_threshold", 2.5)) * 20), 50, lambda v: None)
    cv2.createTrackbar("Init var", win, int(saved.get("initial_variance", 100)), 1000, lambda v: None)
    cv2.createTrackbar("Alpha x100", win, int(saved.get("alpha", 0.1) * 100), 50, lambda v: None)

    geometry = geo.BoardGeometry.from_config(config)
    pipe = None
    state = None
    current = None
    noise_events = 0
    hand_test = False
    print("'s' saves, 'r' recalibrates reference, 'h' toggles hand-test, 'q' quits")

    while True:
        ok, frame = cap.read()
        if not ok:
            break
        z = 3.0 - cv2.getTrackbarPos("Sensitivity", win) / 20.0
        var0 = max(cv2.getTrackbarPos("Init var", win), 1)
        alpha = max(cv2.getTrackbarPos("Alpha x100", win), 1) / 100.0
        settings = {"z_threshold": z, "initial_variance": var0, "alpha": alpha}
        if settings != current:
            current = dict(settings)
            pipe = VisionPipeline(geometry, change_settings=settings)
            state = pipe.capture_reference(pipe.init_state(), frame)

        state, out = pipe.step(state, frame)
        vis = pipe.warp_board(frame)
        bs = pipe.geometry.board_size
        sq = bs // 8
        intensity = np.asarray(out.change_intensity)
        pct = np.asarray(out.change_pct)
        n_changed = 0
        for s in range(64):
            if intensity[s] > 0:
                n_changed += 1
                f, r = s % 8, s // 8
                col, row = f, 7 - r
                x1, y1 = col * sq, row * sq
                overlay = vis.copy()
                cv2.rectangle(overlay, (x1, y1), (x1 + sq, y1 + sq), INTENSITY_COLORS[int(intensity[s])], -1)
                cv2.addWeighted(overlay, 0.4, vis, 0.6, 0, vis)
                cv2.putText(vis, f"{pct[s]:.0f}%", (x1 + 5, y1 + 20),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        if hand_test and n_changed > 3:
            noise_events += 1
        cv2.putText(vis, f"z={z:.2f} var={var0} a={alpha:.2f} changed={n_changed}"
                    + (f" noise_events={noise_events}" if hand_test else ""),
                    (10, bs - 12), cv2.FONT_HERSHEY_SIMPLEX, 0.55, (0, 255, 0), 2)
        cv2.imshow(win, vis)
        key = cv2.waitKey(1) & 0xFF
        if key == ord("q"):
            break
        if key == ord("s"):
            save_json_config(SENSITIVITY_FILE, current)
            print(f"saved {SENSITIVITY_FILE}: {current}")
        elif key == ord("r"):
            state = pipe.capture_reference(state, frame)
        elif key == ord("h"):
            hand_test = not hand_test
            noise_events = 0
    cap.release()
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
