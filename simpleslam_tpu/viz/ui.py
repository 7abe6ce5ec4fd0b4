"""Pause/step/quit keyboard UI (reference VizUI, visualization_utils.py:453-507):
p = pause/resume, n = single step while paused, q/Esc = quit. Uses cv2
HighGUI polling with the reference's ghost-window trick; degrades to a no-op
in headless mode or without cv2."""
from __future__ import annotations


class VizUI:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.paused = False
        self.quit = False
        self._cv2 = None
        if enabled:
            try:
                import cv2
                self._cv2 = cv2
                import numpy as np
                cv2.namedWindow("ui", cv2.WINDOW_NORMAL)
                cv2.resizeWindow("ui", 1, 1)
                cv2.imshow("ui", np.zeros((1, 1), np.uint8))
            except Exception:
                self._cv2 = None

    def poll(self) -> bool:
        """Process keys; blocks while paused. Returns False when quitting."""
        if not self._cv2 or self.quit:
            return not self.quit
        cv2 = self._cv2
        while True:
            k = cv2.waitKey(1) & 0xFF
            if k in (ord("q"), 27):
                self.quit = True
                return False
            if k == ord("p"):
                self.paused = not self.paused
            if self.paused:
                if k == ord("n"):
                    return True       # single step
                cv2.waitKey(30)
                continue
            return True

    def close(self) -> None:
        if self._cv2:
            try:
                self._cv2.destroyWindow("ui")
            except Exception:
                pass
