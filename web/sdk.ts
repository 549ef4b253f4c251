/**
 * TurboMesh TPU browser SDK.
 *
 * Reference parity: web/sdk.ts (TurboMeshSDK over wasm exports). The
 * TPU framework runs as a local HTTP service (`turbomesh-serve`,
 * turbomesh_tpu/web) instead of an in-page wasm module, so the same
 * method surface is provided over fetch(): load / run / free /
 * blocksCount / blockSize / blockPointsView / blockPointsCopy. Methods
 * that crossed the JS<->wasm memory boundary synchronously are async
 * here (one HTTP round-trip each); block points arrive as the same
 * packed f64 [x0, y0, x1, y1, ...] layout (wasm/lib.zig:117-124) and
 * are exposed as a Float64Array without re-parsing.
 */

export type InputConfig = string | Record<string, unknown>;

export type BlockSize = { i: number; j: number };

export type BlockPoints = { size: BlockSize; values: Float64Array };

export type RunResult = { blocks: number; points: number; log: string[] };

export type LoaderOptions = {
  /** Service origin, e.g. "http://127.0.0.1:8732". */
  serverUrl: string;
  /** Receives the run's log lines (mirrors the wasm console_log import). */
  onLog?: (message: string) => void;
  fetchOptions?: RequestInit;
};

export class TurboMeshSDK {
  private constructor(
    private readonly serverUrl: string,
    private readonly onLog: (message: string) => void,
    private readonly fetchOptions: RequestInit,
  ) {}

  /** Connects to a running turbomesh service and verifies it responds. */
  static async load(options: LoaderOptions): Promise<TurboMeshSDK> {
    const url = options.serverUrl.replace(/\/+$/, "");
    const sdk = new TurboMeshSDK(
      url,
      options.onLog ?? ((m: string) => console.log(m)),
      options.fetchOptions ?? {},
    );
    const res = await fetch(`${url}/blocks`, sdk.fetchOptions);
    if (!res.ok) {
      throw new Error(`turbomesh service not reachable at ${url}`);
    }
    return sdk;
  }

  private async request(path: string, init?: RequestInit): Promise<Response> {
    const res = await fetch(`${this.serverUrl}${path}`, {
      ...this.fetchOptions,
      ...init,
    });
    if (!res.ok) {
      let detail = `${res.status}`;
      try {
        detail = ((await res.json()) as { error?: string }).error ?? detail;
      } catch {
        /* keep status */
      }
      throw new Error(`turbomesh request ${path} failed: ${detail}`);
    }
    return res;
  }

  /** Runs the full pipeline (blocking on the server) from a config. */
  async run(input: InputConfig): Promise<RunResult> {
    if (input == null) {
      throw new Error("Valid input is required to run turbomesh.");
    }
    const json = typeof input === "string" ? input : JSON.stringify(input);
    if (json.length === 0) {
      throw new Error("Valid input is required to run turbomesh.");
    }
    const res = await this.request("/run", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: json,
    });
    const out = (await res.json()) as RunResult;
    for (const line of out.log ?? []) {
      this.onLog(line);
    }
    return out;
  }

  /** Drops the mesh held by the service (freeMesh parity). */
  async free(): Promise<void> {
    await this.request("/free", { method: "POST" });
  }

  async blocksCount(): Promise<number> {
    const res = await this.request("/blocks");
    return ((await res.json()) as { count: number }).count;
  }

  async blockSize(blockIdx: number): Promise<BlockSize> {
    const res = await this.request(`/block/${blockIdx}/size`);
    return (await res.json()) as BlockSize;
  }

  /**
   * Fetches a block's packed points. The returned Float64Array views the
   * transferred buffer directly (no copy beyond the network transfer).
   */
  async blockPointsView(blockIdx: number): Promise<BlockPoints> {
    const size = await this.blockSize(blockIdx);
    const res = await this.request(`/block/${blockIdx}/points`);
    const buffer = await res.arrayBuffer();
    const values = new Float64Array(buffer);
    if (values.length === 0) {
      throw new Error(`No point data for block ${blockIdx}`);
    }
    return { size, values };
  }

  async blockPointsCopy(blockIdx: number): Promise<BlockPoints> {
    const view = await this.blockPointsView(blockIdx);
    return { size: view.size, values: new Float64Array(view.values) };
  }
}
