"""Deterministic synthetic F1-wire-format fixture generator.

Produces the same *format* as the reference feed (FIXTURES.md §A0:
Python-literal ``[topic, payload, ts]`` lines; CarData.z / Position.z
payloads base64 + raw-deflate compressed) with synthetic content, so tests
and the transform benchmark never depend on (or copy) the reference's
captured session file.

Known per-topic emission counts are returned so tests can assert the
found==inserted reconciliation semantics (SURVEY §5.1 counters).
"""

from __future__ import annotations

import base64
import json
import random
import zlib
from dataclasses import dataclass, field


def _deflate(obj) -> str:
    raw = json.dumps(obj).encode()
    comp = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    return base64.b64encode(comp.compress(raw) + comp.flush()).decode()


def _ts(i: int) -> str:
    # one event every ~400ms starting 14:00:00 UTC
    total_ms = i * 400
    s, ms = divmod(total_ms, 1000)
    m, s = divmod(s, 60)
    h, m = divmod(m, 60)
    return f"2025-05-17T{14 + h:02d}:{m:02d}:{s:02d}.{ms:03d}Z"


@dataclass
class FixtureCounts:
    lines: int = 0
    per_topic: dict = field(default_factory=dict)
    telemetry_samples: int = 0
    position_samples: int = 0
    weather_rows: int = 0
    rc_messages: int = 0
    lap_rows: int = 0
    corrupt_lines: int = 0

    def bump(self, topic: str) -> None:
        self.per_topic[topic] = self.per_topic.get(topic, 0) + 1
        self.lines += 1


DRIVER_NUMBERS = [1, 4, 16, 44, 55, 63, 81]


def generate(path: str, n_lines: int = 200, seed: int = 42, corrupt_every: int = 50) -> FixtureCounts:
    rng = random.Random(seed)
    counts = FixtureCounts()
    lines: list[str] = []

    def emit(topic: str, payload, i: int) -> None:
        lines.append(repr([topic, payload, _ts(i)]))
        counts.bump(topic)

    # session + driver list up front (like a feed snapshot)
    emit(
        "SessionInfo",
        {
            "Key": "9001",
            "MeetingKey": "1259",
            "Name": "Qualifying",
            "StartDate": "2025-05-17T14:00:00",
            "CircuitShortName": "TestRing",
            "Type": "Qualifying",
            "Location": "Testville",
            "CountryName": "Testland",
        },
        0,
    )
    emit(
        "DriverList",
        {
            str(d): {
                "Name": f"Driver {d}",
                "TeamName": f"Team {d % 3}",
                "Tla": f"D{d:02d}",
                "TeamColour": f"{d * 123456 % 0xFFFFFF:06X}",
                "FirstName": f"First{d}",
                "LastName": f"Last{d}",
                "RacingNumber": str(d),
            }
            for d in DRIVER_NUMBERS
        },
        1,
    )

    lap_counter = {d: 1 for d in DRIVER_NUMBERS}
    for i in range(2, n_lines):
        if corrupt_every and i % corrupt_every == 0:
            lines.append("garbage line !!! not a literal [")
            counts.corrupt_lines += 1
            counts.lines += 1
            continue
        r = rng.random()
        if r < 0.35:  # CarData.z — a few samples x a few cars
            entries = []
            for k in range(rng.randint(1, 3)):
                cars = {
                    str(d): {
                        "Channels": {
                            "0": rng.randint(9000, 12000),
                            "2": rng.randint(100, 340),
                            "3": rng.randint(1, 8),
                            "4": rng.randint(0, 100),
                            "5": rng.choice([0, 100]),
                            "45": rng.choice([0, 8, 10, 12]),
                        }
                    }
                    for d in rng.sample(DRIVER_NUMBERS, rng.randint(2, 5))
                }
                counts.telemetry_samples += len(cars)
                entries.append({"Utc": _ts(i).replace("Z", "000Z"), "Cars": cars})
            emit("CarData.z", _deflate({"Entries": entries}), i)
        elif r < 0.7:  # Position.z
            frames = []
            for k in range(rng.randint(1, 3)):
                ent = {
                    str(d): {
                        "Status": "OnTrack",
                        "X": rng.randint(-3000, 3000),
                        "Y": rng.randint(-3000, 3000),
                        "Z": rng.randint(0, 100),
                    }
                    for d in rng.sample(DRIVER_NUMBERS, rng.randint(2, 5))
                }
                counts.position_samples += len(ent)
                frames.append({"Timestamp": _ts(i).replace("Z", "000Z"), "Entries": ent})
            emit("Position.z", _deflate({"Position": frames}), i)
        elif r < 0.82:  # TimingData — lap completion for a driver
            d = rng.choice(DRIVER_NUMBERS)
            lap = lap_counter[d]
            lap_counter[d] += 1
            m, sec = 1, round(rng.uniform(20, 40), 3)
            entry = {
                "LastLapTime": {"Value": f"{m}:{sec:06.3f}"},
                "NumberOfLaps": str(lap),
                "Sector1Time": {"Value": f"{round(rng.uniform(15, 25), 3)}"},
                "Sector2Time": {"Value": f"{round(rng.uniform(25, 35), 3)}"},
                "BestSpeed": {"Value": str(rng.randint(280, 340))},
                "Position": str(rng.randint(1, len(DRIVER_NUMBERS))),
            }
            counts.lap_rows += 1
            emit("TimingData", {"Lines": {str(d): entry}}, i)
        elif r < 0.9:  # TimingAppData — sector fill-in for an existing lap
            d = rng.choice(DRIVER_NUMBERS)
            lap = max(1, lap_counter[d] - 1)
            entry = {
                "Lines": {
                    "1": {
                        "NumberOfLaps": str(lap),
                        "Sector3": {"Value": f"{round(rng.uniform(18, 28), 3)}"},
                        "SpeedTrap": {"Value": str(rng.randint(280, 340))},
                    }
                }
            }
            emit("TimingAppData", {"Lines": {str(d): entry}}, i)
        elif r < 0.96:  # WeatherData
            counts.weather_rows += 1
            emit(
                "WeatherData",
                {
                    "AirTemp": f"{round(rng.uniform(18, 30), 1)}",
                    "Humidity": f"{round(rng.uniform(20, 80), 1)}",
                    "Pressure": f"{round(rng.uniform(990, 1020), 1)}",
                    "Rainfall": rng.choice(["0", "1", "true", "false"]),
                    "TrackTemp": f"{round(rng.uniform(25, 50), 1)}",
                    "WindDirection": str(rng.randint(0, 359)),
                    "WindSpeed": f"{round(rng.uniform(0, 8), 1)}",
                },
                i,
            )
        else:  # RaceControlMessages — alternate list/dict wire shapes
            msg = {
                "Utc": _ts(i)[:-5],
                "Category": "Flag",
                "Flag": rng.choice(["GREEN", "YELLOW", "CLEAR"]),
                "Scope": "Track",
                "Message": f"TEST MESSAGE {i}",
            }
            counts.rc_messages += 1
            if rng.random() < 0.5:
                emit("RaceControlMessages", {"Messages": [msg]}, i)
            else:
                emit("RaceControlMessages", {"Messages": {str(i): msg}}, i)

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return counts
