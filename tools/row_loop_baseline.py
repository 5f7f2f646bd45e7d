#!/usr/bin/env python3
"""Measured reference-shape baseline (VERDICT r9 item 6).

Re-implements the reference ETL's single-process row-at-a-time loop
shape — open_bus_siri_etl/process_snapshot.py:214-438 — over the same
minute-partitioned `.br` snapshot tree graft.tools.SiriDrain generates,
so BASELINE_measured.md can put a MEASURED rows/s beside graft's
number on the same box and the "within 2x of the reference" bar
becomes falsifiable.

Faithful to the reference per snapshot (process_snapshot):
  - read the minute file, brotli-decompress, json-parse the document
  - get_or_create_siri_snapshot: SELECT, INSERT, commit
  - parse every MonitoredStopVisit into a dict (same fields/casts)
  - ObjectsMaker.get_or_create_objects: routes+stops, then rides, then
    ride_stops — each phase batch-SELECTs missing cache keys then
    INSERTs new dims row by row, commit per phase
  - one INSERT per vehicle_location row, heartbeat UPDATE every 5s
  - update_siri_snapshot_loaded + final commit

Deliberately FASTER than the real reference stack (so the measured
number is an upper bound and graft's margin is conservative):
  - sqlite3 stdlib in-process instead of Postgres over TCP
  - plain dict rows instead of SQLAlchemy ORM instances

Usage: python3 tools/row_loop_baseline.py <landingDir> [dbPath]
Prints one JSON line: snapshots, visits, wall_sec, visits_per_sec.
"""
import glob
import json
import os
import sqlite3
import sys
import time

try:
    import brotlicffi as brotli
except ImportError:  # pragma: no cover
    import brotli


def parse_timestr(s):
    # reference uses dateutil; fromisoformat handles the +02:00 form
    from datetime import datetime
    return datetime.fromisoformat(s).timestamp()


def parse_monitored_stop_visit(msv):
    try:
        mvj = msv['MonitoredVehicleJourney']
        return dict(
            recorded_at_time=parse_timestr(msv['RecordedAtTime']),
            line_ref=int(mvj['LineRef']),
            operator_ref=int(mvj['OperatorRef']),
            journey_ref=mvj['FramedVehicleJourneyRef']['DataFrameRef'] + '-' +
                        mvj['FramedVehicleJourneyRef']['DatedVehicleJourneyRef'],
            scheduled_start_time=parse_timestr(mvj['OriginAimedDepartureTime']),
            vehicle_ref=mvj.get('VehicleRef', ''),
            order=int(mvj['MonitoredCall']['Order']),
            stop_point_ref=int(mvj['MonitoredCall']['StopPointRef']),
            lon=float(mvj['VehicleLocation']['Longitude']),
            lat=float(mvj['VehicleLocation']['Latitude']),
            bearing=int(mvj.get('Bearing', -1)),
            velocity=int(mvj.get('Velocity', -1)),
            distance_from_journey_start=int(mvj['MonitoredCall'].get('DistanceFromStop', -1)),
        )
    except Exception:
        return None


SCHEMA = """
CREATE TABLE IF NOT EXISTS siri_snapshot (
  id INTEGER PRIMARY KEY, snapshot_id TEXT UNIQUE, etl_status TEXT,
  etl_start_time REAL, etl_end_time REAL, last_heartbeat REAL,
  num_successful_parse_vehicle_locations INTEGER,
  num_failed_parse_vehicle_locations INTEGER);
CREATE TABLE IF NOT EXISTS siri_route (
  id INTEGER PRIMARY KEY, operator_ref INTEGER, line_ref INTEGER);
CREATE UNIQUE INDEX IF NOT EXISTS route_key ON siri_route(operator_ref, line_ref);
CREATE TABLE IF NOT EXISTS siri_stop (id INTEGER PRIMARY KEY, code INTEGER UNIQUE);
CREATE TABLE IF NOT EXISTS siri_ride (
  id INTEGER PRIMARY KEY, siri_route_id INTEGER, journey_ref TEXT,
  scheduled_start_time REAL, vehicle_ref TEXT);
CREATE UNIQUE INDEX IF NOT EXISTS ride_key ON siri_ride(siri_route_id, journey_ref, vehicle_ref);
CREATE TABLE IF NOT EXISTS siri_ride_stop (
  id INTEGER PRIMARY KEY, siri_ride_id INTEGER, siri_stop_id INTEGER, "order" INTEGER);
CREATE UNIQUE INDEX IF NOT EXISTS ride_stop_key
  ON siri_ride_stop(siri_ride_id, siri_stop_id, "order");
CREATE TABLE IF NOT EXISTS siri_vehicle_location (
  id INTEGER PRIMARY KEY, siri_snapshot_id INTEGER, siri_ride_stop_id INTEGER,
  recorded_at_time REAL, lon REAL, lat REAL, bearing INTEGER,
  velocity INTEGER, distance_from_journey_start INTEGER);
"""


class ObjectsMaker:
    """ObjectsMaker's three-phase get-or-create with in-memory caches
    (process_snapshot.py:96-212): batch SELECT for keys missing from
    the cache, then row-by-row INSERT for keys still missing."""

    def __init__(self):
        self.routes, self.stops, self.rides, self.ride_stops = {}, {}, {}, {}

    def phase_routes_stops(self, cur, pmsvs):
        route_fetch, stop_fetch = set(), set()
        for p in pmsvs:
            rk = (p['operator_ref'], p['line_ref'])
            if rk not in self.routes:
                route_fetch.add(rk)
            if p['stop_point_ref'] not in self.stops:
                stop_fetch.add(p['stop_point_ref'])
        for op, line in route_fetch:
            row = cur.execute(
                'SELECT id FROM siri_route WHERE operator_ref=? AND line_ref=?',
                (op, line)).fetchone()
            if row:
                self.routes[(op, line)] = row[0]
        for code in stop_fetch:
            row = cur.execute('SELECT id FROM siri_stop WHERE code=?', (code,)).fetchone()
            if row:
                self.stops[code] = row[0]
        for p in pmsvs:
            rk = (p['operator_ref'], p['line_ref'])
            if rk not in self.routes:
                cur.execute('INSERT INTO siri_route(operator_ref, line_ref) VALUES(?,?)', rk)
                self.routes[rk] = cur.lastrowid
            if p['stop_point_ref'] not in self.stops:
                cur.execute('INSERT INTO siri_stop(code) VALUES(?)', (p['stop_point_ref'],))
                self.stops[p['stop_point_ref']] = cur.lastrowid

    def phase_rides(self, cur, pmsvs):
        for p in pmsvs:
            route_id = self.routes[(p['operator_ref'], p['line_ref'])]
            k = (route_id, p['journey_ref'], p['vehicle_ref'])
            if k in self.rides:
                continue
            row = cur.execute(
                'SELECT id FROM siri_ride WHERE siri_route_id=? AND journey_ref=? AND vehicle_ref=?',
                k).fetchone()
            if row:
                self.rides[k] = row[0]
            else:
                cur.execute(
                    'INSERT INTO siri_ride(siri_route_id, journey_ref, scheduled_start_time, vehicle_ref)'
                    ' VALUES(?,?,?,?)',
                    (route_id, p['journey_ref'], p['scheduled_start_time'], p['vehicle_ref']))
                self.rides[k] = cur.lastrowid

    def phase_ride_stops(self, cur, pmsvs):
        for p in pmsvs:
            route_id = self.routes[(p['operator_ref'], p['line_ref'])]
            ride_id = self.rides[(route_id, p['journey_ref'], p['vehicle_ref'])]
            stop_id = self.stops[p['stop_point_ref']]
            k = (ride_id, stop_id, p['order'])
            if k in self.ride_stops:
                continue
            row = cur.execute(
                'SELECT id FROM siri_ride_stop WHERE siri_ride_id=? AND siri_stop_id=? AND "order"=?',
                k).fetchone()
            if row:
                self.ride_stops[k] = row[0]
            else:
                cur.execute(
                    'INSERT INTO siri_ride_stop(siri_ride_id, siri_stop_id, "order") VALUES(?,?,?)', k)
                self.ride_stops[k] = cur.lastrowid


def main():
    landing = sys.argv[1]
    db_path = sys.argv[2] if len(sys.argv) > 2 else '/tmp/row_loop_baseline.sqlite'
    if os.path.exists(db_path):
        os.unlink(db_path)
    conn = sqlite3.connect(db_path)
    conn.executescript(SCHEMA)
    conn.commit()
    files = sorted(glob.glob(os.path.join(landing, '*/*/*/*/*.br')))
    maker = ObjectsMaker()
    cur = conn.cursor()
    n_visits = 0
    last_heartbeat = time.time()
    t0 = time.time()
    for path in files:
        snapshot_id = '/'.join(path[:-3].split(os.sep)[-5:])
        with open(path, 'rb') as f:
            data = json.loads(brotli.decompress(f.read()))
        # get_or_create_siri_snapshot (SELECT, INSERT, commit)
        row = cur.execute('SELECT id FROM siri_snapshot WHERE snapshot_id=?',
                          (snapshot_id,)).fetchone()
        if row is None:
            cur.execute(
                'INSERT INTO siri_snapshot(snapshot_id, etl_status, etl_start_time, last_heartbeat)'
                " VALUES(?,'loading',?,?)", (snapshot_id, time.time(), time.time()))
            conn.commit()
            snap_pk = cur.lastrowid
        else:
            snap_pk = row[0]
        pmsvs, n_failed = [], 0
        for delivery in data['Siri']['ServiceDelivery']['StopMonitoringDelivery']:
            for msv in delivery.get('MonitoredStopVisit', []):
                p = parse_monitored_stop_visit(msv)
                if p:
                    pmsvs.append(p)
                else:
                    n_failed += 1
        maker.phase_routes_stops(cur, pmsvs)
        conn.commit()
        maker.phase_rides(cur, pmsvs)
        conn.commit()
        maker.phase_ride_stops(cur, pmsvs)
        conn.commit()
        for p in pmsvs:
            route_id = maker.routes[(p['operator_ref'], p['line_ref'])]
            ride_id = maker.rides[(route_id, p['journey_ref'], p['vehicle_ref'])]
            rs_id = maker.ride_stops[(ride_id, maker.stops[p['stop_point_ref']], p['order'])]
            cur.execute(
                'INSERT INTO siri_vehicle_location(siri_snapshot_id, siri_ride_stop_id,'
                ' recorded_at_time, lon, lat, bearing, velocity, distance_from_journey_start)'
                ' VALUES(?,?,?,?,?,?,?,?)',
                (snap_pk, rs_id, p['recorded_at_time'], p['lon'], p['lat'],
                 p['bearing'], p['velocity'], p['distance_from_journey_start']))
            if time.time() - last_heartbeat > 5:  # update_siri_snapshot_heartbeat
                cur.execute('UPDATE siri_snapshot SET last_heartbeat=? WHERE id=?',
                            (time.time(), snap_pk))
                conn.commit()
                last_heartbeat = time.time()
        cur.execute(
            "UPDATE siri_snapshot SET etl_status='loaded', etl_end_time=?,"
            ' num_successful_parse_vehicle_locations=?, num_failed_parse_vehicle_locations=?'
            ' WHERE id=?', (time.time(), len(pmsvs), n_failed, snap_pk))
        conn.commit()
        n_visits += len(pmsvs)
    wall = time.time() - t0
    print(json.dumps(dict(
        metric='row_loop_baseline', snapshots=len(files), visits=n_visits,
        wall_sec=round(wall, 3),
        visits_per_sec=round(n_visits / wall, 1) if wall > 0 else None,
        db=db_path)))


if __name__ == '__main__':
    main()
