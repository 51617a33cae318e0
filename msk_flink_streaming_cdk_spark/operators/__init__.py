from .reference import q1_high_temp_alerts, q2_windowed_avg

__all__ = ["q1_high_temp_alerts", "q2_windowed_avg"]
