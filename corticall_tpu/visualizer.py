"""Graph visualizer: embedded HTTP server + force-directed subgraph view.

Parity with utils/visualizer/GraphVisualizer.java:25-48 (com.sun.net
httpserver + d3 front end) and commands/visualizer/ (VisualCortex starts the
server, SendToVisualizer posts subgraphs): an http.server serving a
self-contained canvas force-layout page and subgraph JSON endpoints.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!DOCTYPE html>
<html><head><title>corticall_tpu graph</title>
<style>body{font-family:sans-serif;margin:0}#info{position:absolute;top:8px;left:8px;
background:#fffc;padding:6px 10px;border-radius:6px;font-size:13px}</style></head>
<body><div id="info">corticall_tpu visualizer &mdash; drag to pan, wheel to zoom</div>
<canvas id="c"></canvas>
<script>
const canvas=document.getElementById('c');const ctx=canvas.getContext('2d');
canvas.width=innerWidth;canvas.height=innerHeight;
let nodes=[],links=[],tx=0,ty=0,scale=1;
fetch('/graph').then(r=>r.json()).then(g=>{
  const idx={};g.vertices.forEach((v,i)=>{idx[v.id]=i;
    nodes.push({id:v.id,label:v.kmer,color:v.color||0,
      x:Math.random()*canvas.width,y:Math.random()*canvas.height,vx:0,vy:0});});
  g.edges.forEach(e=>links.push({s:idx[e.source],t:idx[e.target],color:e.color||0}));
  tick();});
const palette=['#4269d0','#efb118','#ff725c','#6cc5b0','#3ca951','#ff8ab7'];
function tick(){
  for(let it=0;it<3;it++){
    links.forEach(l=>{const a=nodes[l.s],b=nodes[l.t];
      const dx=b.x-a.x,dy=b.y-a.y,d=Math.hypot(dx,dy)||1,f=(d-24)*0.02;
      a.vx+=f*dx/d;a.vy+=f*dy/d;b.vx-=f*dx/d;b.vy-=f*dy/d;});
    for(let i=0;i<nodes.length;i++)for(let j=i+1;j<nodes.length;j++){
      const a=nodes[i],b=nodes[j];const dx=b.x-a.x,dy=b.y-a.y;
      const d2=dx*dx+dy*dy+1;if(d2<4000){const f=120/d2;
        a.vx-=f*dx;a.vy-=f*dy;b.vx+=f*dx;b.vy+=f*dy;}}
    nodes.forEach(n=>{n.x+=n.vx*=0.85;n.y+=n.vy*=0.85;});}
  ctx.setTransform(1,0,0,1,0,0);ctx.clearRect(0,0,canvas.width,canvas.height);
  ctx.setTransform(scale,0,0,scale,tx,ty);
  ctx.strokeStyle='#bbb';
  links.forEach(l=>{ctx.beginPath();ctx.moveTo(nodes[l.s].x,nodes[l.s].y);
    ctx.lineTo(nodes[l.t].x,nodes[l.t].y);ctx.stroke();});
  nodes.forEach(n=>{ctx.fillStyle=palette[n.color%palette.length];
    ctx.beginPath();ctx.arc(n.x,n.y,4,0,7);ctx.fill();});
  requestAnimationFrame(tick);}
let drag=null;
canvas.onmousedown=e=>drag={x:e.clientX-tx,y:e.clientY-ty};
canvas.onmousemove=e=>{if(drag){tx=e.clientX-drag.x;ty=e.clientY-drag.y;}};
canvas.onmouseup=()=>drag=null;
canvas.onwheel=e=>{scale*=e.deltaY<0?1.1:0.9;e.preventDefault();};
</script></body></html>"""


def subgraph_to_json(g) -> dict:
    """Subgraph -> d3-style {vertices, edges} payload
    (utils/visualizer/handlers/SubGraphHandler equivalent)."""
    verts = []
    ids = {}
    for i, v in enumerate(g.vertices()):
        ids[v] = i
        verts.append({"id": i, "kmer": v.kmer, "copy": v.copy, "index": v.index})
    edges = [{"source": ids[u], "target": ids[v], "color": c}
             for u in g.vertices() for v, c in g.out_edges(u)]
    return {"vertices": verts, "edges": edges}


class GraphVisualizer:
    def __init__(self, port: int = 0):
        self._payload = {"vertices": [], "edges": []}

        viz = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, body: bytes, ctype: str):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/graph":
                    self._send(json.dumps(viz._payload).encode(),
                               "application/json")
                else:
                    self._send(_PAGE.encode(), "text/html")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                viz._payload = json.loads(self.rfile.read(n))
                self._send(b"ok", "text/plain")

        self.server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def display(self, subgraph, name: str = "") -> None:
        """Replace the displayed graph (GraphVisualizer.display equivalent)."""
        self._payload = subgraph_to_json(subgraph)

    def shutdown(self) -> None:
        self.server.shutdown()
