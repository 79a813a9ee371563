"""Engine configuration constants.

These mirror the *configuration data* shipped with the reference system
(thresholds, grok regexes, pattern lists, lookup sets) so the rebuilt engine
reproduces its semantics exactly. Citations point into ``/root/reference``:

- grok regexes:            config/patterns.yaml:6-15
- performance thresholds:  config/config.yaml:17-20
- attack/scan patterns:    config/config.yaml:25-38
- anomaly settings:        config/config.yaml:41-44
- alert throttling:        config/config.yaml:47-49
- suspicious IPs:          config/suspicious_ips.txt:5-13
- severity weights/levels: src/analyzers/security.py:346-350,373-380
- brute-force threshold:   src/analyzers/security.py:279
- login keywords:          src/analyzers/security.py:266
- dangerous HTTP methods:  src/analyzers/security.py:311-312
- status descriptions:     dashboard.py:205-221
"""

from __future__ import annotations

# --- grok regexes (config/patterns.yaml:6-15). Anchored at the start only:
# the reference uses re.match, so 'combined' lines also match 'common' and the
# cascade combined_time -> combined -> common picks the most specific.
RE_COMMON = (
    r'^(\S+) \S+ \S+ \[([^\]]+)\] "([A-Z]+) ([^ "]+) ([^"]+)" (\d+) (\d+|-)'
)
RE_COMBINED = RE_COMMON + r' "([^"]*)" "([^"]*)"'
RE_COMBINED_TIME = RE_COMBINED + r" (\d+\.\d+)"
RE_ERROR = r"^\[([^\]]+)\] \[([^\]]+)\] \[([^\]]+)\] \[([^\]]+)\] (.*)"

# Capture-group order of the access regexes above.
ACCESS_GROUPS = [
    "ip_address",
    "timestamp",
    "method",
    "endpoint",
    "protocol",
    "status",
    "bytes_sent",
    "referer",
    "user_agent",
    "response_time",
]
ERROR_GROUPS = ["timestamp", "level", "module", "pid", "message"]

# --- performance thresholds (config/config.yaml:17-20)
SLOW_ENDPOINT_AVG = 0.5  # seconds
SLOW_ENDPOINT_P95 = 2.0  # seconds
HIGH_ERROR_RATE = 0.05

# min requests per endpoint before emitting metrics (performance.py:82)
MIN_ENDPOINT_SUPPORT = 5
# assumed metric window seconds (performance.py:91)
METRIC_TIME_WINDOW = 3600

# --- security (config/config.yaml:25-38); matched case-insensitively
# (security.py:45 re.IGNORECASE)
ATTACK_PATTERNS = [
    "SELECT.*FROM",
    "DELETE.*FROM",
    "UNION.*SELECT",
    "../..",
    "/etc/passwd",
    "<script>",
]
SCAN_PATTERNS = [".git", "wp-admin", "wp-login", "phpMyAdmin", ".env", ".config"]

SUSPICIOUS_IPS = [
    # scanners (config/suspicious_ips.txt:5-8)
    "45.33.10.20",
    "185.191.171.8",
    "82.221.129.19",
    "89.248.167.131",
    # attackers (config/suspicious_ips.txt:11-13)
    "23.129.64.102",
    "103.234.220.197",
    "185.222.209.133",
]

LOGIN_KEYWORDS = ["login", "signin", "auth", "wp-login", "admin"]  # security.py:266
BRUTE_FORCE_STATUSES = [401, 403, 404]  # security.py:269
BRUTE_FORCE_THRESHOLD = 5  # security.py:279
DANGEROUS_METHODS = ["PUT", "DELETE", "TRACE", "CONNECT", "OPTIONS"]  # security.py:312

SEVERITY_WEIGHTS = {"low": 1, "medium": 5, "high": 10}  # security.py:346-350
THREAT_LEVEL_HIGH = 20  # security.py:375
THREAT_LEVEL_MEDIUM = 10  # security.py:377

# --- anomaly detection (config/config.yaml:41-44)
Z_SCORE_THRESHOLD = 3.0
MIN_DATA_POINTS = 10
ANOMALY_WINDOW_SIZE = 3600
ROLLING_WINDOW = 5  # detector.py:82
ROLLING_MIN_PERIODS = 3  # detector.py:82
IQR_MULTIPLIER = 1.5  # detector.py:124

# --- alerting (config/config.yaml:47-49)
MIN_ANOMALIES_FOR_ALERT = 5
THROTTLE_PERIOD = 3600

# --- status-code descriptions (dashboard.py:205-221)
STATUS_DESCRIPTIONS = {
    200: "OK",
    201: "Created",
    204: "No Content",
    301: "Moved Permanently",
    302: "Found",
    304: "Not Modified",
    400: "Bad Request",
    401: "Unauthorized",
    403: "Forbidden",
    404: "Not Found",
    405: "Method Not Allowed",
    500: "Internal Server Error",
    502: "Bad Gateway",
    503: "Service Unavailable",
    504: "Gateway Timeout",
}
