import os, resource
def pytest_runtest_teardown(item):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    import psutil
    cur = psutil.Process().memory_info().rss // (1 << 20)
    with open("/tmp/rss_log.txt", "a") as f:
        f.write(f"{cur}MB cur {rss}MB peak {item.nodeid}\n")
