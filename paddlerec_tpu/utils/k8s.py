"""Kubernetes pod discovery / rank assignment.

Parity target: reference tools/k8s_tools.py:15-185 — namespace pod
listing by label selector, phase waiting, and trainer-rank assignment by
sorted pod IP.  The ``kubernetes`` client is an optional dependency
(gated import); everything degrades to env-var-driven behavior so
single-machine runs work unchanged.
"""

from __future__ import annotations

import os
import socket
import time
from typing import List, Optional, Tuple

try:  # pragma: no cover - optional dep
    from kubernetes import client as _k8s_client
    from kubernetes import config as _k8s_config

    _HAS_K8S = True
except ImportError:  # pragma: no cover
    _HAS_K8S = False


def _api():
    if not _HAS_K8S:
        raise RuntimeError(
            "kubernetes client not installed; pod discovery unavailable "
            "(set PADDLEREC_POD_IPS for env-driven rank assignment)"
        )
    if os.getenv("KUBERNETES_SERVICE_HOST"):
        _k8s_config.load_incluster_config()
    else:
        _k8s_config.load_kube_config()
    return _k8s_client.CoreV1Api()


def fetch_pods_info(label_selector: str,
                    phase: Optional[str] = None) -> List[Tuple[str, str, str]]:
    """[(phase, pod_ip, name)] for pods matching the selector."""
    v1 = _api()
    resp = v1.list_namespaced_pod(
        namespace=os.getenv("NAMESPACE", "default"),
        label_selector=label_selector,
    )
    out = []
    for item in resp.items:
        p = item.status.phase
        if item.metadata.deletion_timestamp is not None:
            p = "Terminating"
        if phase is not None and p != phase:
            continue
        out.append((p, item.status.pod_ip, item.metadata.name))
    return out


def count_pods_by_phase(label_selector: str, phase: str) -> int:
    return len(fetch_pods_info(label_selector, phase))


def wait_pods_running(label_selector: str, desired: int,
                      poll_s: float = 5.0) -> None:
    while count_pods_by_phase(label_selector, "Running") < int(desired):
        time.sleep(poll_s)


def pod_ips(label_selector: Optional[str] = None) -> List[str]:
    """Sorted pod IPs — from k8s when available, else PADDLEREC_POD_IPS."""
    env = os.getenv("PADDLEREC_POD_IPS")
    if env:
        return sorted(ip for ip in env.split(",") if ip)
    return sorted(
        ip for _, ip, _ in fetch_pods_info(label_selector or "", "Running")
        if ip
    )


def my_rank(label_selector: Optional[str] = None) -> int:
    """This pod's trainer rank = index of its IP in the sorted pod list
    (the reference assigns PADDLE_TRAINER_ID the same way)."""
    env_rank = os.getenv("PADDLE_TRAINER_ID") or os.getenv("RANK")
    if env_rank is not None:
        return int(env_rank)
    ips = pod_ips(label_selector)
    me = os.getenv("POD_IP") or socket.gethostbyname(socket.gethostname())
    return ips.index(me) if me in ips else 0
