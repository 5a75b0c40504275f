// lpm_serve: fully native serving binary — no Python anywhere.
//
//   lpm_serve --export_dir=/path/to/export --port=8500 [--check]
//
// Loads an artifact exported with with_stablehlo (export_model.py writes
// stablehlo.mlir + native_manifest.txt + weights.bin), compiles the module
// through the XLA PJRT CPU client (stablehlo_runner.cc), preloads the
// weights once as device buffers, and serves the same HTTP contract as
// serving.py: POST /predict with uint32-LE length-framed serialized
// records → {"predictions": [{"video_index", "classes", "scores"}]},
// GET /healthz → ok.  Records are parsed by the same wire-format proto
// parser the data pipeline uses (tfrecord_reader.cc).
//
// This is the C++ counterpart of the reference's TF-Serving deployment of
// its SavedModel exports (ref: export_model.py#ModelExporter
// serving_default) — the whole request path is native: socket → proto
// parse → PJRT execute → JSON.
//
// Threading: single accept loop, one request at a time (the compiled
// module is single-stream; concurrency belongs in a fronting LB, exactly
// as serving.py documents).  --check loads everything, runs one zero
// batch, prints the first scores and exits — the smoke gate tests use.

#include <arpa/inet.h>
#include <csignal>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

// --- extern C APIs from the sibling translation units ----------------------

extern "C" {
// stablehlo_runner.cc
void* shr_compile(const char* mlir_data, int64_t mlir_len, char* err,
                  int64_t err_cap);
int32_t shr_preload(void* handle, int32_t nargs, const void** arg_data,
                    const int32_t* arg_dtypes, const int64_t* arg_dims,
                    const int32_t* arg_ndims, char* err, int64_t err_cap);
int32_t shr_execute(void* handle, int32_t nargs, const void** arg_data,
                    const int32_t* arg_dtypes, const int64_t* arg_dims,
                    const int32_t* arg_ndims, int32_t nouts, void** out_data,
                    const int64_t* out_bytes, char* err, int64_t err_cap);
void shr_destroy(void* handle);
// tfrecord_reader.cc
int32_t lpm_parse_frame_record(const uint8_t* data, int64_t len,
                               int32_t max_frames,
                               const int32_t* feature_sizes,
                               int32_t n_features, const char* feature_names,
                               uint8_t* out_frames, int32_t* out_num_frames);
int32_t lpm_parse_video_record(const uint8_t* data, int64_t len,
                               const int32_t* feature_sizes,
                               int32_t n_features, const char* feature_names,
                               float* out_features);
}

namespace {

// dtype tags (native_manifest.txt) → runner codes (stablehlo_runner.cc)
int32_t DtypeCode(const std::string& tag) {
  if (tag == "f32") return 0;
  if (tag == "s32") return 1;
  if (tag == "u8") return 2;
  if (tag == "bf16") return 3;
  if (tag == "s8") return 4;
  if (tag == "s64") return 5;
  if (tag == "pred") return 6;
  if (tag == "f64") return 7;
  return -1;
}

int64_t DtypeBytes(int32_t code) {
  switch (code) {
    case 0: case 1: return 4;
    case 2: case 4: case 6: return 1;
    case 3: return 2;
    case 5: case 7: return 8;
    default: return 0;
  }
}

struct ArraySpec {
  int32_t dtype = -1;
  std::vector<int64_t> dims;
  int64_t elems() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
  int64_t bytes() const { return elems() * DtypeBytes(dtype); }
};

struct Manifest {
  std::string model;
  int32_t batch_size = 0, top_k = 0, frame_features = 0, max_frames = 0;
  std::vector<std::string> feature_names;
  std::vector<int32_t> feature_sizes;
  std::vector<ArraySpec> call_inputs, outputs, weights;
};

bool ReadFileBytes(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  bool ok = fread(out->data(), 1, n, f) == static_cast<size_t>(n);
  fclose(f);
  return ok;
}

bool ParseSpecRow(FILE* f, const char* kind, ArraySpec* spec) {
  char seen[32], tag[16];
  int32_t ndim;
  if (fscanf(f, "%31s %15s %d", seen, tag, &ndim) != 3) return false;
  if (strcmp(seen, kind) != 0) return false;
  spec->dtype = DtypeCode(tag);
  if (spec->dtype < 0 || ndim < 0 || ndim > 8) return false;
  spec->dims.resize(ndim);
  for (int i = 0; i < ndim; i++) {
    long long d;
    if (fscanf(f, "%lld", &d) != 1) return false;
    spec->dims[i] = d;
  }
  return true;
}

bool LoadManifest(const std::string& path, Manifest* m) {
  FILE* f = fopen(path.c_str(), "r");
  if (!f) return false;
  char word[64];
  int version, n;
  bool ok = fscanf(f, "%63s %d", word, &version) == 2 &&
            strcmp(word, "lpm_native_manifest") == 0 && version == 1;
  char name[128];
  ok = ok && fscanf(f, "%63s %127s", word, name) == 2 &&
       strcmp(word, "model") == 0;
  if (ok) m->model = name;
  auto scalar = [&](const char* key, int32_t* out) {
    return fscanf(f, "%63s %d", word, out) == 2 && strcmp(word, key) == 0;
  };
  ok = ok && scalar("batch_size", &m->batch_size);
  ok = ok && scalar("top_k", &m->top_k);
  ok = ok && scalar("frame_features", &m->frame_features);
  ok = ok && scalar("max_frames", &m->max_frames);
  ok = ok && scalar("n_features", &n);
  for (int i = 0; ok && i < n; i++) {
    int32_t size;
    ok = fscanf(f, "%63s %127s %d", word, name, &size) == 3 &&
         strcmp(word, "feature") == 0;
    if (ok) {
      m->feature_names.push_back(name);
      m->feature_sizes.push_back(size);
    }
  }
  ok = ok && scalar("n_call_inputs", &n);
  m->call_inputs.resize(ok ? n : 0);
  for (auto& s : m->call_inputs) ok = ok && ParseSpecRow(f, "call_input", &s);
  ok = ok && scalar("n_outputs", &n);
  m->outputs.resize(ok ? n : 0);
  for (auto& s : m->outputs) ok = ok && ParseSpecRow(f, "output", &s);
  ok = ok && scalar("n_weights", &n);
  m->weights.resize(ok ? n : 0);
  for (auto& s : m->weights) ok = ok && ParseSpecRow(f, "weight", &s);
  fclose(f);
  return ok;
}

std::string PackNames(const std::vector<std::string>& names) {
  std::string out;
  for (const auto& n : names) {
    out += n;
    out += '\0';
  }
  return out;
}

// --- the loaded model ------------------------------------------------------

struct Server {
  Manifest m;
  void* handle = nullptr;
  std::vector<uint8_t> weights_blob;  // backs the preloaded buffers
  std::string names_packed;
  int32_t total_size = 0;

  // request-scratch buffers, sized once (requests are serialized)
  std::vector<std::vector<uint8_t>> in_bufs, out_bufs;

  bool Load(const std::string& export_dir, std::string* err) {
    char errbuf[4096] = {0};
    if (!LoadManifest(export_dir + "/native_manifest.txt", &m)) {
      *err = "cannot parse native_manifest.txt (re-export with "
             "with_stablehlo)";
      return false;
    }
    names_packed = PackNames(m.feature_names);
    for (int32_t s : m.feature_sizes) total_size += s;

    std::vector<uint8_t> mlir;
    if (!ReadFileBytes(export_dir + "/stablehlo.mlir", &mlir)) {
      *err = "cannot read stablehlo.mlir";
      return false;
    }
    if (!ReadFileBytes(export_dir + "/weights.bin", &weights_blob)) {
      *err = "cannot read weights.bin";
      return false;
    }
    int64_t want = 0;
    for (const auto& w : m.weights) want += w.bytes();
    if (want != static_cast<int64_t>(weights_blob.size())) {
      *err = "weights.bin size mismatch vs manifest";
      return false;
    }

    handle = shr_compile(reinterpret_cast<const char*>(mlir.data()),
                         mlir.size(), errbuf, sizeof(errbuf));
    if (!handle) {
      *err = errbuf;
      return false;
    }

    std::vector<const void*> data(m.weights.size());
    std::vector<int32_t> dtypes(m.weights.size()), ndims(m.weights.size());
    std::vector<int64_t> dims;
    int64_t off = 0;
    for (size_t i = 0; i < m.weights.size(); i++) {
      data[i] = weights_blob.data() + off;
      dtypes[i] = m.weights[i].dtype;
      ndims[i] = m.weights[i].dims.size();
      dims.insert(dims.end(), m.weights[i].dims.begin(),
                  m.weights[i].dims.end());
      off += m.weights[i].bytes();
    }
    if (shr_preload(handle, m.weights.size(), data.data(), dtypes.data(),
                    dims.empty() ? nullptr : dims.data(), ndims.data(),
                    errbuf, sizeof(errbuf)) != 0) {
      *err = errbuf;
      return false;
    }
    // Predict() reinterprets out[0] as f32 values [B, k], out[1] as s32
    // indices [B, k] — pin that layout here rather than crashing later
    if (m.outputs.size() != 2 || m.outputs[0].dtype != 0 ||
        m.outputs[1].dtype != 1 || m.outputs[0].dims.size() != 2 ||
        m.outputs[0].dims[1] != m.top_k || m.outputs[1].dims != m.outputs[0].dims) {
      *err = "manifest outputs are not (f32 [B,k] values, s32 [B,k] indices)";
      return false;
    }
    if (m.call_inputs.empty() || m.batch_size <= 0 ||
        m.call_inputs[0].dims.empty() ||
        m.call_inputs[0].dims[0] != m.batch_size) {
      *err = "manifest call inputs inconsistent with batch_size";
      return false;
    }
    for (const auto& s : m.call_inputs) in_bufs.emplace_back(s.bytes(), 0);
    for (const auto& s : m.outputs) out_bufs.emplace_back(s.bytes(), 0);
    return true;
  }

  // records (spans into the request body) → JSON predictions, or "" + err.
  std::string Predict(const std::vector<std::pair<const uint8_t*, int64_t>>&
                          records,
                      std::string* err) {
    const int32_t B = m.batch_size;
    const int32_t k = m.top_k;
    // in_bufs/out_bufs are member scratch sized at Load(); the record
    // parsers fully overwrite each row (they memset their own output), so
    // no per-request clearing is needed

    std::string json = "{\"predictions\": [";
    char errbuf[4096] = {0};
    const size_t row_bytes = m.frame_features
                                 ? static_cast<size_t>(m.max_frames) * total_size
                                 : sizeof(float) * total_size;

    for (size_t start = 0; start < records.size();
         start += static_cast<size_t>(B)) {
      size_t n_real = records.size() - start;
      if (n_real > static_cast<size_t>(B)) n_real = B;
      // parse chunk; pad by repeating the last record's row
      for (int32_t i = 0; i < B; i++) {
        size_t r = start + (i < static_cast<int32_t>(n_real)
                                ? i
                                : n_real - 1);
        uint8_t* row = in_bufs[0].data() + i * row_bytes;
        if (m.frame_features) {
          int32_t nf = 0;
          if (lpm_parse_frame_record(records[r].first, records[r].second,
                                     m.max_frames, m.feature_sizes.data(),
                                     m.feature_sizes.size(),
                                     names_packed.c_str(), row, &nf) != 0) {
            *err = "malformed record";
            return "";
          }
          if (in_bufs.size() > 1)
            reinterpret_cast<int32_t*>(in_bufs[1].data())[i] = nf;
        } else {
          if (lpm_parse_video_record(records[r].first, records[r].second,
                                     m.feature_sizes.data(),
                                     m.feature_sizes.size(),
                                     names_packed.c_str(),
                                     reinterpret_cast<float*>(row)) != 0) {
            *err = "malformed record";
            return "";
          }
        }
      }

      std::vector<const void*> data(in_bufs.size());
      std::vector<int32_t> dtypes(in_bufs.size()), ndims(in_bufs.size());
      std::vector<int64_t> dims;
      for (size_t i = 0; i < in_bufs.size(); i++) {
        data[i] = in_bufs[i].data();
        dtypes[i] = m.call_inputs[i].dtype;
        ndims[i] = m.call_inputs[i].dims.size();
        dims.insert(dims.end(), m.call_inputs[i].dims.begin(),
                    m.call_inputs[i].dims.end());
      }
      std::vector<void*> outs(out_bufs.size());
      std::vector<int64_t> out_bytes(out_bufs.size());
      for (size_t i = 0; i < out_bufs.size(); i++) {
        outs[i] = out_bufs[i].data();
        out_bytes[i] = out_bufs[i].size();
      }
      if (shr_execute(handle, data.size(), data.data(), dtypes.data(),
                      dims.data(), ndims.data(), outs.size(), outs.data(),
                      out_bytes.data(), errbuf, sizeof(errbuf)) != 0) {
        *err = errbuf;
        return "";
      }

      const float* values = reinterpret_cast<const float*>(out_bufs[0].data());
      const int32_t* indices =
          reinterpret_cast<const int32_t*>(out_bufs[1].data());
      char num[64];
      for (size_t i = 0; i < n_real; i++) {
        if (start + i) json += ", ";
        snprintf(num, sizeof(num), "{\"video_index\": %zu, \"classes\": [",
                 start + i);
        json += num;
        for (int32_t j = 0; j < k; j++) {
          snprintf(num, sizeof(num), "%s%d", j ? ", " : "", indices[i * k + j]);
          json += num;
        }
        json += "], \"scores\": [";
        for (int32_t j = 0; j < k; j++) {
          float v = values[i * k + j];
          // JSON has no NaN/Inf; a diverged checkpoint must not emit an
          // unparseable 200 body — null marks the broken score honestly
          if (std::isfinite(v)) {
            snprintf(num, sizeof(num), "%s%.6f", j ? ", " : "", v);
          } else {
            snprintf(num, sizeof(num), "%snull", j ? ", " : "");
          }
          json += num;
        }
        json += "]}";
      }
    }
    json += "]}";
    return json;
  }
};

// --- minimal HTTP/1.1 ------------------------------------------------------

constexpr size_t kMaxBody = 64u << 20;

bool RecvRequest(int fd, std::string* head, std::vector<uint8_t>* body) {
  head->clear();
  body->clear();
  char buf[8192];
  size_t header_end = std::string::npos;
  std::string data;
  while (header_end == std::string::npos) {
    ssize_t n = recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) return false;
    data.append(buf, n);
    header_end = data.find("\r\n\r\n");
    if (data.size() > kMaxBody) return false;
  }
  *head = data.substr(0, header_end);
  size_t content_len = 0;
  // case-insensitive Content-Length scan
  for (size_t pos = 0; (pos = data.find(':', pos)) != std::string::npos &&
                       pos < header_end;
       pos++) {
    size_t ls = data.rfind('\n', pos);
    ls = (ls == std::string::npos) ? 0 : ls + 1;
    std::string key = data.substr(ls, pos - ls);
    for (auto& c : key) c = tolower(c);
    if (key == "content-length") {
      content_len = strtoull(data.c_str() + pos + 1, nullptr, 10);
      break;
    }
  }
  if (content_len > kMaxBody) return false;
  std::string rest = data.substr(header_end + 4);
  body->assign(rest.begin(), rest.end());
  while (body->size() < content_len) {
    ssize_t n = recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) return false;
    body->insert(body->end(), buf, buf + n);
  }
  body->resize(content_len);
  return true;
}

void SendResponse(int fd, int status, const char* status_text,
                  const std::string& content_type, const std::string& body) {
  char head[256];
  snprintf(head, sizeof(head),
           "HTTP/1.1 %d %s\r\nContent-Type: %s\r\nContent-Length: %zu\r\n"
           "Connection: close\r\n\r\n",
           status, status_text, content_type.c_str(), body.size());
  std::string out = head + body;
  size_t sent = 0;
  while (sent < out.size()) {
    ssize_t n = send(fd, out.data() + sent, out.size() - sent, 0);
    if (n <= 0) return;
    sent += n;
  }
}

bool UnframeRecords(const std::vector<uint8_t>& body,
                    std::vector<std::pair<const uint8_t*, int64_t>>* records) {
  size_t pos = 0;
  while (pos + 4 <= body.size()) {
    uint32_t len;
    memcpy(&len, body.data() + pos, 4);
    pos += 4;
    if (pos + len > body.size()) return false;
    records->emplace_back(body.data() + pos, len);
    pos += len;
  }
  // serving.py#unframe_records silently ignores <4 trailing bytes; only a
  // record overrunning the body is a framing error (caught above)
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  // a client closing mid-response must EPIPE the send(), not kill the server
  signal(SIGPIPE, SIG_IGN);
  std::string export_dir;
  int port = 8500;
  bool check_only = false;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a.rfind("--export_dir=", 0) == 0) export_dir = a.substr(13);
    else if (a.rfind("--port=", 0) == 0) port = atoi(a.c_str() + 7);
    else if (a == "--check") check_only = true;
    else {
      fprintf(stderr, "unknown arg: %s\n", a.c_str());
      return 2;
    }
  }
  if (export_dir.empty()) {
    fprintf(stderr,
            "usage: lpm_serve --export_dir=DIR [--port=8500] [--check]\n");
    return 2;
  }

  Server server;
  std::string err;
  if (!server.Load(export_dir, &err)) {
    fprintf(stderr, "load failed: %s\n", err.c_str());
    return 1;
  }
  fprintf(stderr, "loaded %s (model %s, batch %d, top_k %d)\n",
          export_dir.c_str(), server.m.model.c_str(), server.m.batch_size,
          server.m.top_k);

  if (check_only) {
    // one empty record exercises parse → execute → format
    static const uint8_t dummy = 0;
    std::vector<std::pair<const uint8_t*, int64_t>> records = {{&dummy, 0}};
    std::string json = server.Predict(records, &err);
    if (json.empty()) {
      fprintf(stderr, "check failed: %s\n", err.c_str());
      return 1;
    }
    printf("%s\n", json.c_str());
    return 0;
  }

  int sfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(sfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr = {};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (bind(sfd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      listen(sfd, 16) != 0) {
    fprintf(stderr, "cannot bind :%d\n", port);
    return 1;
  }
  printf("lpm_serve: serving %s on :%d (batch %d)\n", export_dir.c_str(),
         port, server.m.batch_size);
  fflush(stdout);

  std::string head;
  std::vector<uint8_t> body;
  while (true) {
    int fd = accept(sfd, nullptr, nullptr);
    if (fd < 0) continue;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    // an idle connection must not wedge the single accept loop
    struct timeval tmo = {30, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tmo, sizeof(tmo));
    if (!RecvRequest(fd, &head, &body)) {
      close(fd);
      continue;
    }
    if (head.rfind("GET /healthz", 0) == 0) {
      SendResponse(fd, 200, "OK", "text/plain", "ok");
    } else if (head.rfind("POST /predict", 0) == 0) {
      std::vector<std::pair<const uint8_t*, int64_t>> records;
      if (!UnframeRecords(body, &records) || records.empty()) {
        SendResponse(fd, 400, "Bad Request", "application/json",
                     "{\"error\": \"bad record framing\"}");
      } else {
        err.clear();
        std::string json = server.Predict(records, &err);
        if (json.empty()) {
          SendResponse(fd, 500, "Internal Server Error", "application/json",
                       std::string("{\"error\": \"") + err + "\"}");
        } else {
          SendResponse(fd, 200, "OK", "application/json", json);
        }
      }
    } else {
      SendResponse(fd, 404, "Not Found", "text/plain", "not found");
    }
    close(fd);
  }
}
