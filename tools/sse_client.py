"""Terminal SSE client: strip `data:` framing from /gen streams.

Parity with the reference's server/print.py helper.

    python tools/sse_client.py "http://localhost:3000/gen?prompt=hello"
"""

import sys
import urllib.request


def main():
    url = sys.argv[1] if len(sys.argv) > 1 else "http://localhost:3000/gen?prompt=hello"
    with urllib.request.urlopen(url) as resp:
        for raw in resp:
            line = raw.decode("utf-8", "replace").rstrip("\n")
            if line.startswith("data: "):
                print(line[6:].replace("\\n", "\n"), end="", flush=True)
    print()


if __name__ == "__main__":
    main()
